package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening — resolve every node of a parent-pointer forest
  * (org chart, bill-of-materials, category tree) to its ROOT and DEPTH.
  * Spark has no recursive CTE; the distributed form is an iterative
  * ancestor join, one shuffle per tree LEVEL (not per node), terminating
  * when a pass resolves no further ancestors. Depth of real hierarchies
  * is small (10-20), so the loop runs a handful of bounded passes over
  * ever-shrinking frontiers; d12's label propagation is the same shape
  * on undirected similarity graphs. For pathological depths, switch to
  * pointer doubling (anc := anc-of-anc, O(log depth) passes) — the plain
  * per-level join is the readable default and what the gate pins.
  *
  * Frontier rows (still-unresolved) are checkpointed to a scratch parquet
  * every `checkpointEvery` passes so the lineage does not grow one join
  * per level (the same reliable-materialization pattern as [[Dedup]]'s
  * clustering loop).
  */
object Hierarchy {

  /** `edges`: (node, parent) — one row per non-root node; roots have no
    * row. Returns (node, root, depth) for EVERY node appearing in `nodes`
    * (depth 0 = root). `maxDepth` bounds the loop against cycles. */
  def flatten(nodes: DataFrame, edges: DataFrame, maxDepth: Int = 50,
      checkpointEvery: Int = 10): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val sp = nodes.sparkSession
    val e = edges.select(col("node").as("__en"),
      col("parent").as("__ep"))
    var state = nodes.select(col("node"), col("node").as("root"),
      lit(0).as("depth"))
    var done = state.limit(0)
    var depth = 0
    var remaining = 1L
    while (remaining > 0 && depth < maxDepth) {
      // nodes whose current ancestor has a parent climb one level; the
      // rest are resolved and leave the frontier
      val joined = state.join(e, state("root") === e("__en"), "left")
      val resolved = joined.filter(col("__ep").isNull)
        .select(col("node"), col("root"), col("depth"))
      val climbing = joined.filter(col("__ep").isNotNull)
        .select(col("node"), col("__ep").as("root"),
          (col("depth") + 1).as("depth"))
      done = done.unionByName(resolved)
      state = climbing
      depth += 1
      if (depth % checkpointEvery == 0) {
        val scratch = graft.Tables.scratchDir(s"graft-hier-$depth")
        state.write.mode("overwrite").parquet(scratch)
        state = sp.read.parquet(scratch)
      }
      remaining = state.limit(1).count() // cheap emptiness probe
    }
    done.unionByName(state) // maxDepth leftovers surface as-is
  }

  /** Pointer-doubling form — the DEEP-hierarchy scale path: each pass
    * composes the jump table with itself (`anc := anc's anc`,
    * `depth += anc's depth`), so a depth-D tree resolves in ⌈log₂ D⌉
    * passes instead of D. The per-pass join is over the FULL node set
    * (nothing shrinks) — worth it when depth, not width, is the problem;
    * [[flatten]] is the default for the shallow hierarchies real data
    * has. Same output contract as [[flatten]]. */
  def flattenDoubling(nodes: DataFrame, edges: DataFrame,
      maxPasses: Int = 20): DataFrame = {
    val sp = nodes.sparkSession
    // jump(n) = (anc, d): the highest KNOWN ancestor and its distance
    var jump = nodes.select(col("node"))
      .join(edges.select(col("node"), col("parent")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("parent"), col("node")).as("anc"),
        when(col("parent").isNull, 0).otherwise(1).as("depth"),
        col("parent").isNull.as("done"))
    var pass = 0
    var unresolved = 1L
    while (unresolved > 0 && pass < maxPasses) {
      val j2 = jump.select(col("node").as("__n2"), col("anc").as("__a2"),
        col("depth").as("__d2"), col("done").as("__done2"))
      jump = jump.join(j2, jump("anc") === j2("__n2"), "left")
        .select(col("node"),
          when(col("done") || col("__a2").isNull, col("anc"))
            .otherwise(col("__a2")).as("anc"),
          when(col("done") || col("__a2").isNull, col("depth"))
            .otherwise(col("depth") + col("__d2")).as("depth"),
          (col("done") || col("__a2").isNull || col("__done2"))
            .as("done"))
      pass += 1
      if (pass % 5 == 0) { // flatten lineage like the per-level form
        val scratch = graft.Tables.scratchDir(s"graft-hier2-$pass")
        jump.write.mode("overwrite").parquet(scratch)
        jump = sp.read.parquet(scratch)
      }
      unresolved = jump.filter(!col("done")).limit(1).count()
    }
    jump.select(col("node"), col("anc").as("root"), col("depth"))
  }
}
