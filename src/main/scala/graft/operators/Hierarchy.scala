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
}
