package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (Deequ-style constraint suite) —
  * the admission gate a pipeline runs before a snapshot is allowed into a
  * training mix or a downstream join.
  *
  * Row-level checks (not-null, range, set membership, regex, …) all
  * evaluate in a SINGLE aggregation pass: each check contributes one
  * conditional-sum column, so 100 TB is scanned exactly once regardless of
  * how many expectations are declared, with partial aggregation collapsing
  * each input partition to one row before the (one-row) shuffle. Whole-
  * table checks that need their own shape — key uniqueness (a groupBy on
  * the key), referential integrity (an anti join) — run as separate
  * minimal passes and union into the same report.
  *
  * Output is long-format: (constraint, n_violations, status), one row per
  * expectation — the shape a scheduler can alert on.
  */
object Expect {

  /** Evaluate row-level expectations in one scan. Each (name, predicate)
    * pair counts the rows where the predicate is FALSE OR NULL (a null
    * check result is a violation — unknown is not a pass). An EMPTY input
    * reports 0 violations / pass (the sums coalesce to 0, matching
    * [[uniqueCheck]]'s convention — sum over zero rows is NULL in SQL). */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)),
        lit(0L)).as(s"__c$i")
    }
    // long format via explode of literal structs — no SQL-string splicing,
    // so constraint names may contain quotes or any other character
    val pairs = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("constraint"), col(s"__c$i").as("n_violations"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.constraint"), col("kv.n_violations"))
  }

  /** Key-uniqueness expectation: violations = rows carrying a duplicated
    * key (total rows minus distinct keys would hide WHICH side; counting
    * rows in groups of size > 1 matches how a dedup would see it). */
  def uniqueCheck(df: DataFrame, keyCols: Seq[String],
      name: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L))
        .as("n_violations"))
      .select(lit(name).as("constraint"), col("n_violations"))

  /** Referential-integrity expectation: violations = child rows whose
    * NON-NULL foreign key has no match in `parent` (SQL FK semantics — a
    * NULL FK passes; pair with a not-null row check to forbid it). LEFT
    * ANTI join — at scale the parent key set is usually broadcastable or
    * bloom-prunable, and Catalyst picks broadcast automatically when it
    * fits. */
  def fkCheck(child: DataFrame, fk: String, parent: DataFrame, pk: String,
      name: String): DataFrame =
    child.filter(child(fk).isNotNull)
      .join(parent, child(fk) === parent(pk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("constraint"), col("n_violations"))

  /** Union per-check frames into the final report with a pass/fail
    * status column, ordered by constraint name. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_))
      .select(col("constraint"), col("n_violations"),
        when(col("n_violations") === 0, "pass").otherwise("fail")
          .as("status"))
      .orderBy(col("constraint"))
}
