package graft.model

/** How root-document `_link` surrogate keys are generated.
  *
  * The reference (flatterer) uses the 0-based document index
  * (`/root/reference/docs/changelog.md:309`, fixtures
  * `basic_expected/csv/main.csv`). On a cluster a global sequential index
  * forces an extra job + barrier, so we also offer the two scale-friendly
  * modes the reference itself gestures at (`docs/options.md:210-214`
  * recommends `no_link` + natural keys for big data).
  */
sealed trait LinkMode
object LinkMode {
  /** Deterministic 0-based row index via `zipWithIndex` (golden parity;
    * costs one extra Spark job over the scan). */
  case object Sequential extends LinkMode
  /** `monotonically_increasing_id` — no extra job, unique but not dense
    * and not stable across runs. Right choice for 100 TB batch loads. */
  case object Monotonic extends LinkMode
  /** Use an existing column as the root key (natural/business key).
    * Fully parallel, deterministic, join-friendly — preferred at scale. */
  final case class NaturalKey(column: String) extends LinkMode
}

/** Per-field output control — mirrors the reference's `fields.csv` input
  * (`/root/reference/docs/options.md:500-564`): ordering, renaming
  * (`field_title`), and (with `onlyFields`) selection.
  */
final case class FieldSpec(tableName: String, fieldName: String, fieldTitle: Option[String] = None)

/** Per-table output control — mirrors `tables.csv`
  * (`/root/reference/docs/options.md:566-622`). */
final case class TableSpec(tableName: String, tableTitle: String)

/** Options for the flatten planner. Mirrors the reference engine's
  * `Options` struct (`/root/reference/src/lib.rs:40-82`) re-expressed for a
  * Spark-first engine. Everything here is plan-construction metadata — the
  * planner stays a pure function `(DataFrame, FlattenOptions) =>
  * Map[table, DataFrame]` so it can also run under `foreachBatch`.
  *
  * @param mainTableName  name of the root table (`src/lib.rs:56`; python
  *                       default "main", `flatterer/__init__.py:315`)
  * @param pathSeparator  separator for promoted sub-object columns and
  *                       child-table names (`docs/options.md:690-731`)
  * @param tablePrefix    prefix applied to all non-main table names
  *                       (`docs/options.md:128-150`)
  * @param idPrefix       prefix for every `_link` value
  *                       (`flatterer/__init__.py:251`)
  * @param noLink         suppress `_link`/`_link_*` columns entirely
  *                       (`docs/options.md:210-227`)
  * @param linkMode       root key generation strategy (see [[LinkMode]])
  * @param pushdown       field names copied from every ancestor table into
  *                       descendants as `<ancestor>_<field>`
  *                       (`docs/options.md:152-208`)
  * @param arraysNewTable scalar arrays become child tables with a single
  *                       `value` column (`docs/options.md:644-661`)
  * @param inlineOneToOne arrays that never exceed one element across the
  *                       whole input are inlined like sub-objects
  *                       (`docs/options.md:624-642`). Requires a global
  *                       pre-aggregation pass (one extra job).
  * @param emitObj        paths of 1:1 sub-objects to emit as their own
  *                       tables anyway (`src/lib.rs:58`; semantics inferred
  *                       from the name/signature — one child row per parent,
  *                       position 0)
  * @param onlyTables     if set with `tables` specs, drop unlisted tables
  * @param onlyFields     if set with `fields` specs, drop unlisted fields
  * @param fields         field order/title control (first-listed wins;
  *                       unlisted fields appended in discovery order)
  * @param tables         table title control
  * @param preview        if > 0, sinks write only the first N rows per
  *                       table while metadata still reflects all data
  *                       (`docs/options.md:776-794`)
  * @param dropEmptyObjects  array elements that are empty objects (all
  *                       fields null) produce no child row
  *                       (`docs/changelog.md:279`)
  */
final case class FlattenOptions(
    mainTableName: String = "main",
    pathSeparator: String = "_",
    tablePrefix: String = "",
    idPrefix: String = "",
    noLink: Boolean = false,
    linkMode: LinkMode = LinkMode.Sequential,
    pushdown: Seq[String] = Nil,
    arraysNewTable: Boolean = false,
    inlineOneToOne: Boolean = false,
    emitObj: Seq[Seq[String]] = Nil,
    onlyTables: Boolean = false,
    onlyFields: Boolean = false,
    fields: Seq[FieldSpec] = Nil,
    tables: Seq[TableSpec] = Nil,
    preview: Int = 0,
    dropEmptyObjects: Boolean = true
)
