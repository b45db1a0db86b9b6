package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Small-file compaction — the nightly maintenance pass every large table
  * needs: streaming ingestion and per-micro-batch writes leave thousands of
  * KB-sized files whose open/footer cost eventually dominates scans, so the
  * table is periodically rewritten into few large, range-sorted files.
  *
  * The compaction is ONE range-partition shuffle (`repartitionByRange` +
  * `sortWithinPartitions`): output files are non-overlapping sorted runs on
  * the layout key, so downstream range predicates skip whole files via
  * parquet min/max stats — the same data-skipping idea as Layout's Z-order,
  * in its single-key form. Explicit file counts (not AQE-coalesced) keep
  * output layout deterministic.
  */
object Compact {

  /** Rewrite `srcDir` into `numFiles` range-sorted parquet files at
    * `dstDir`. */
  def compactFiles(spark: SparkSession, srcDir: String, dstDir: String,
      numFiles: Int, sortKey: Column): Unit = {
    require(numFiles > 0, "numFiles must be > 0")
    spark.read.parquet(srcDir)
      .repartitionByRange(numFiles, sortKey)
      .sortWithinPartitions(sortKey)
      .write.mode("overwrite").parquet(dstDir)
  }

  /** Data files in a written parquet directory (part files only). */
  def dataFileCount(dir: String): Int = {
    val fs = new java.io.File(dir).listFiles()
    if (fs == null) 0
    else fs.count(f => f.getName.startsWith("part-") &&
      f.getName.endsWith(".parquet"))
  }
}
