package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Three-way MERGE — the lakehouse upsert primitive (Delta/Iceberg
  * `MERGE INTO ... WHEN MATCHED / WHEN NOT MATCHED / WHEN NOT MATCHED BY
  * SOURCE`), composed from portable Spark built-ins so it runs against
  * plain parquet snapshots:
  *
  *  - matched rows (key in both) take the SOURCE values  → action `updated`
  *  - source-only rows are inserted                      → action `inserted`
  *  - base-only rows are kept                            → action `kept`
  *    unless `deleteWhen` holds on them (the WHEN NOT MATCHED BY SOURCE
  *    DELETE clause) — those rows are dropped from the output.
  *
  * Distinct from [[Cdc]] (latest-version-wins compaction of a change LOG)
  * and [[Diff]] (reports differences, changes nothing): MERGE APPLIES a
  * changeset to a snapshot in one pass.
  *
  * Scale shape: ONE full-outer hash join on the key plus map-side CASEs —
  * the same core engines execute `MERGE INTO` with (minus their
  * file-level pruning); both sides shuffle on the key once, no window, no
  * driver state. The per-row `action` column is the row-grain form of the
  * MERGE metrics lakehouses report (numUpdatedRows / numInsertedRows /
  * numDeletedRows), so an audit aggregation is one groupBy away.
  */
object Merge {

  /** Apply `source` to `base` (identical schemas, `key` a unique key in
    * each). `deleteWhen` is evaluated on the OUTPUT row (base values —
    * only `kept` rows are eligible), mirroring MERGE's
    * whenNotMatchedBySource(condition).delete(); like SQL's DELETE, a
    * NULL condition does NOT delete (only TRUE does).
    *
    * NULL keys follow SQL MERGE's join semantics: a NULL-key row never
    * matches (the ON clause is a plain equality), so a NULL-key base row
    * is `kept` and a NULL-key source row is `inserted` — presence is
    * tracked with explicit marker columns, never inferred from key
    * nullness. */
  def threeWayMerge(base: DataFrame, source: DataFrame, key: String,
      deleteWhen: Column = lit(false)): DataFrame = {
    require(source.columns.toSeq == base.columns.toSeq,
      s"source schema ${source.columns.toSeq} must match base " +
        s"${base.columns.toSeq}")
    // Names alone are not "identical schemas": a dtype mismatch would
    // otherwise coerce silently through the when/otherwise projection (or
    // fail later with an opaque join/cast error). Nullability is allowed
    // to differ — it carries no merge semantics.
    locally {
      val bt = base.schema.map(f => (f.name, f.dataType))
      val st = source.schema.map(f => (f.name, f.dataType))
      require(st == bt,
        s"source column types $st must match base $bt")
    }
    val valueCols = base.columns.filter(_ != key).toSeq
    val b = base.select(lit(true).as("__bp") +: col(key).as("__bk") +:
      valueCols.map(c => col(c).as(s"__b_$c")): _*)
    val s = source.select(lit(true).as("__sp") +: col(key).as("__sk") +:
      valueCols.map(c => col(c).as(s"__s_$c")): _*)
    val inSrc = col("__sp").isNotNull
    val action =
      when(col("__bp").isNotNull && inSrc, lit("updated"))
        .when(inSrc, lit("inserted"))
        .otherwise(lit("kept"))
    val merged = b.join(s, col("__bk") === col("__sk"), "full_outer")
      .select((when(inSrc, col("__sk")).otherwise(col("__bk")).as(key) +:
        valueCols.map(c => when(inSrc, col(s"__s_$c"))
          .otherwise(col(s"__b_$c")).as(c))) :+ action.as("action"): _*)
    merged.filter(!(col("action") === "kept" &&
      coalesce(deleteWhen, lit(false))))
  }
}
