package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological even for
  * AQE (a handful of keys holding a large fraction of rows).
  *
  * `saltedJoin`: the fact side scatters each row into one of `salt` subkeys
  * (deterministically, from a high-cardinality discriminator column so
  * re-runs are stable); the dimension side replicates `salt` times. The join
  * key becomes (key, salt), splitting each hot key's rows across `salt`
  * tasks.
  *
  * Scale: replication costs salt x |dim|, so use for fact-dim joins with
  * hot keys; for fact-fact skew prefer AQE skew-join splitting
  * (spark.sql.adaptive.skewJoin, on by default in our sessions).
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, discriminator: Column, salt: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(abs(hash(discriminator)), lit(salt)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Adaptive variant: `saltedJoin` pays salt x |dim| replication whether or
    * not the data is skewed. Here the fact side is SAMPLED first (one
    * sampled partial-agg job, the same config-sized driver-collect pattern
    * as the bloom filter and k-means centroids); only keys whose estimated
    * row count exceeds `hotThreshold` are salted, capped at `hotCap` keys so
    * the collected list stays bounded no matter how wrong the threshold is.
    * Cold keys join with salt 0 and a single dim copy — on a uniform key
    * distribution the hot list is empty and the plan degenerates to the
    * plain join (replication factor 1, asserted in OperatorSpec). The hot
    * list rides a broadcast join, so fact and dim are each scanned once.
    *
    * Result is identical to the plain join for ANY hot list — sampling only
    * steers performance, never correctness. */
  def adaptiveSaltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, discriminator: Column, maxSalt: Int,
      hotThreshold: Long, sampleFraction: Double = 0.05, seed: Long = 42L,
      hotCap: Int = 1000): DataFrame = {
    val spark = fact.sparkSession
    val sampled =
      if (sampleFraction >= 1.0) fact.select(col(factKey))
      else fact.select(col(factKey)).sample(sampleFraction, seed)
    // estimated rows per key = sampled count / fraction; keep the heaviest
    val hotRows = sampled.groupBy(col(factKey)).count()
      .filter(col("count") >= lit(hotThreshold * math.min(sampleFraction, 1.0)))
      .orderBy(col("count").desc).limit(hotCap)
      .select(col(factKey).as("__hotkey"))
      .collect() // <= hotCap rows — config-sized, like Bloom/centroid builds
    val hotSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__hotkey",
        fact.schema(factKey).dataType)))
    val hot = spark.createDataFrame(
      java.util.Arrays.asList(hotRows: _*), hotSchema)
    val salted = fact
      .join(broadcast(hot), fact(factKey) === hot("__hotkey"), "left")
      .withColumn("__salt", when(col("__hotkey").isNotNull,
        pmod(abs(hash(discriminator)), lit(maxSalt))).otherwise(lit(0)))
      .drop("__hotkey")
    val replicated = dim
      .join(broadcast(hot), dim(dimKey) === hot("__hotkey"), "left")
      .withColumn("__salt", explode(sequence(lit(0),
        when(col("__hotkey").isNotNull, lit(maxSalt - 1)).otherwise(lit(0)))))
      .drop("__hotkey")
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
