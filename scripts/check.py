#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `runMain graft.Verify <sfDir> <outDir>`:
  - registers each parquet table in <sfDir> as a DuckDB view,
  - runs every oracle from <outDir>/oracle_sql.json,
  - compares against the Spark result parquet in <outDir>/<name>/,
    column-name-sorted, row-sorted, with exact value equality
    (floats compared exactly first, then with 1e-9 tolerance fallback
    so we can see *how* close a mismatch is).

Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/vout
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify writes errors.json when any declared query failed to produce
    # output — surface those up front so a shrunken artifact can never
    # read as all-green here either
    try:
        verify_errors = json.load(open(f"{out_dir}/errors.json"))
    except FileNotFoundError:
        verify_errors = {}
    for name, err in sorted(verify_errors.items()):
        print(f"FAIL {name}: VERIFY_ERROR {err}")
    results = {}
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            oracle = con.sql(sql)
            o_cols = [d[0] for d in oracle.description]
            o_rows = oracle.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        spark = con.sql(f"SELECT * FROM read_parquet({files!r})")
        s_cols = [d[0] for d in spark.description]
        s_rows = spark.fetchall()
        if sorted(o_cols) != sorted(s_cols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(s_cols)} oracle={sorted(o_cols)}"
            continue
        oc, orows = canon(o_rows, o_cols)
        sc, srows = canon(s_rows, s_cols)
        if len(orows) != len(srows):
            results[name] = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b and not close(a, b):
                bad = (i, a, b)
                break
        results[name] = "OK" if bad is None else f"VALUE_MISMATCH row{bad[0]}: spark={bad[1]} oracle={bad[2]}"
    # rows-only queries (no oracle): check non-empty parquet exists
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            if files:
                n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
                results[name] = f"ROWS_ONLY n={n}"
            else:
                results[name] = "ROWS_ONLY MISSING"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else '    '} {k}: {v}")
    print(f"\n{ok}/{len(oracles)} oracle-checked queries OK" +
          (f"; {len(verify_errors)} Verify-side failures" if verify_errors else ""))
    return 0 if ok == len(oracles) and not verify_errors else 1

def close(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                continue
        return False
    return True

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
