package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-similarity self-join with PREFIX FILTERING (the PPJoin/AllPairs
  * candidate generation of Bayardo et al. / Xiao et al.) — the exact
  * complement to the MinHash/SimHash families: those are probabilistic
  * candidate generators with exact confirm; this one is EXACT end-to-end.
  *
  * The theorem: order every record's elements by one GLOBAL total order
  * (here: ascending document frequency, ties by element — rarest first)
  * and take each record's first |r| - ceil(tau*|r|) + 1 elements as its
  * prefix. Two sets with Jaccard >= tau MUST share at least one prefix
  * element, so blocking on prefix elements loses nothing. Rare-first
  * ordering is also the scale story: block buckets are keyed by the
  * RAREST elements of each record, so bucket sizes track the tail of the
  * frequency distribution, not the stopword head — the hot-key problem
  * removes itself by construction instead of needing a cap.
  *
  * Shapes: element-frequency agg (one shuffle), per-record sort by
  * (df, element) (record-vocabulary-sized lists), prefix explode +
  * self-equi-join on the prefix element carrying ONLY id pairs, distinct,
  * size filter (|A| >= tau*|B| both ways — necessary for Jaccard >= tau),
  * then two joins to fetch the full sets and one codegen
  * `array_intersect` confirm. Candidate traffic is id-pair-sized; full
  * sets travel only for surviving candidates.
  */
object SetSimJoin {

  /** `set` must be an array of elements (made distinct internally);
    * returns (id_a, id_b, jac) with id_a < id_b and Jaccard >= tau,
    * jac rounded to 4. */
  def jaccardJoin(df: DataFrame, id: Column, set: Column,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    val recs = df.select(id.as("__id"), array_distinct(set).as("__s"))
      .filter(size(col("__s")) > 0)
    val elems = recs.select(col("__id"), explode(col("__s")).as("__e"))
    val freq = elems.groupBy(col("__e")).agg(count(lit(1)).as("__df"))
    // staged: THREE consumers below (prefix explode + both verify join
    // sides) would each re-run the tokenize+shingle+df-sort pipeline
    val ordered = graft.Tables.stage(elems.join(freq, "__e")
      .groupBy(col("__id"))
      .agg(transform(
        array_sort(collect_list(struct(col("__df"), col("__e")))),
        s => s.getField("__e")).as("__toks"),
        count(lit(1)).as("__n")), "graft-ppjoin-ordered")
    val plen = (col("__n") - ceil(lit(tau) * col("__n")) + 1).cast("int")
    val pfx = ordered.select(col("__id"),
      explode(slice(col("__toks"), lit(1), plen)).as("__p"))
    val cand = pfx.as("a")
      .join(pfx.as("b"),
        col("a.__p") === col("b.__p") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val aSide = ordered.select(col("__id").as("id_a"),
      col("__toks").as("__ta"), col("__n").as("__na"))
    val bSide = ordered.select(col("__id").as("id_b"),
      col("__toks").as("__tb"), col("__n").as("__nb"))
    val inter = size(array_intersect(col("__ta"), col("__tb")))
    cand.join(aSide, "id_a").join(bSide, "id_b")
      // size filter: Jaccard >= tau forces tau*|B| <= |A| (and symm.)
      .filter(col("__na") >= lit(tau) * col("__nb") &&
        col("__nb") >= lit(tau) * col("__na"))
      .withColumn("__i", inter)
      .withColumn("__jac", col("__i").cast("double") /
        (col("__na") + col("__nb") - col("__i")))
      .filter(col("__jac") >= tau)
      .select(col("id_a"), col("id_b"), round(col("__jac"), 4).as("jac"))
  }
}
