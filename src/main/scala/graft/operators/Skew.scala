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
}
