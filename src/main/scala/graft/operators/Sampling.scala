package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic dataset splitting for training pipelines.
  *
  * Assignment is a pure function of the row's key (portable md5 hash mod
  * 100), so it is reproducible in any engine, independent of partitioning
  * and row order, and STABLE UNDER CORPUS GROWTH: a document keeps its
  * split forever, no matter what is added or removed around it — the
  * property random sampling and `randomSplit` lack, and the one that
  * prevents train/test contamination across corpus versions.
  *
  * Scale: one codegen'd hash per row, no shuffle, no state.
  */
object Sampling {

  /** Add a `split` column ("train" / "val" / "test") by hash percent:
    * [0, trainPct) -> train, [trainPct, trainPct+valPct) -> val, rest test.
    */
  def hashSplit(df: DataFrame, key: Column, trainPct: Int,
      valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must be within [0, 100]")
    val bucket = Hashing.portableHash32(key) % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
