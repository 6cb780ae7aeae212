#!/usr/bin/env bash
# Dual-SF oracle sweep for CHANGED queries — the round gate the
# planted-only-oracle hazard demands (it has bitten three times, always
# at sf0.1 only: x16/x17 in r15, x15/x23/x24 in r17). Any query whose
# code path changed this round goes through BOTH scale factors before
# the change is committed:
#
#   scripts/verify_changed.sh x23_near_dedup_apply,x43_shared_windows
#
# Runs graft.Verify with the per-query filter at sf0.01 and sf0.1, then
# scripts/check.py (the DuckDB oracle) on each output. Exits non-zero if
# either sweep has any FAIL. A full no-filter sweep at sf0.1 costs ~80
# CPU-minutes of DuckDB (the all-pairs shingle oracles) — this filtered
# form is why per-query verification is cheap enough to gate every
# change.
set -uo pipefail
if [ $# -lt 1 ]; then
  echo "usage: scripts/verify_changed.sh <q1,q2,...> [sf ...]" >&2
  exit 2
fi
queries="$1"; shift
sfs=${@:-"sf0.01 sf0.1"}
cd "$(dirname "$0")/.."
rc=0
for sf in $sfs; do
  out=$(mktemp -d "/tmp/graft_vchanged_${sf}_XXXX")
  echo "=== $sf → $out ==="
  sbt "runMain graft.Verify /root/testdata/$sf $out $queries" || { rc=1; continue; }
  # check.py exits non-zero unless every oracle-checked query is OK and
  # Verify recorded no failures
  python3 scripts/check.py "/root/testdata/$sf" "$out" 2>&1 | tee "$out/check.log"
  [ "${PIPESTATUS[0]}" -eq 0 ] || rc=1
done
if [ $rc -ne 0 ]; then echo "verify_changed: FAIL (see logs above)" >&2; fi
exit $rc
