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

  /** GPT-style sequence-packing layout, SHARDED — the scale form: documents
    * are partitioned by `shard`, concatenated in `orderKey` order WITHIN
    * each shard, and chunked into `capacity`-token windows per shard. Emits
    * each doc's shard, its token offset within the shard, its shard-local
    * pack (context window) id, and whether it straddles a window boundary —
    * the bookkeeping a pretraining data loader needs. (shard, pack_id) is
    * the globally unique window key, exactly how distributed tokenizer
    * pipelines name their output chunks.
    *
    * Scale: one window pass partitioned by shard — every shard's running
    * sum computes in its own task, so the operator parallelizes with the
    * shard count (vs. the unsharded overload's single-partition window). */
  def packingLayout(df: DataFrame, shard: Column, orderKey: Column,
      nTokens: Column, capacity: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(orderKey)
    df.withColumn("shard", shard)
      .withColumn("__n", nTokens)
      .withColumn("start_offset",
        coalesce(sum(col("__n")).over(
          w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("pack_id", expr(s"start_offset div $capacity"))
      .withColumn("spans_boundary",
        expr(s"(start_offset + __n - 1) div $capacity") > col("pack_id"))
      .drop("__n")
  }

  /** Unsharded [[packingLayout]]: ONE global concatenation order. Correct,
    * but the global running sum is a single-partition window — use only for
    * corpus slices that fit one task; at scale shard first (e.g. by
    * [[hashSplit]] bucket or date) via the sharded overload. */
  def packingLayout(df: DataFrame, orderKey: Column, nTokens: Column,
      capacity: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderKey)
    df.withColumn("__n", nTokens)
      .withColumn("start_offset",
        coalesce(sum(col("__n")).over(
          w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("pack_id", expr(s"start_offset div $capacity"))
      .withColumn("spans_boundary",
        expr(s"(start_offset + __n - 1) div $capacity") > col("pack_id"))
      .drop("__n")
  }

  /** FIRST-FIT-DECREASING bin packing to a token budget — the padding-
    * waste killer beside [[packingLayout]]'s concat-then-chunk: documents
    * are NOT split across context windows; each doc lands whole in the
    * first bin with room, docs placed longest-first. FFD guarantees
    * ≤ 11/9·OPT + 1 bins (Johnson 1973), which at LLM context sizes
    * means low-single-digit-percent padding waste instead of the chunk
    * layout's mid-sequence document truncation.
    *
    * Distributed shape: a length-bucket SHUFFLE on `shard` (hash
    * partition), then an in-memory greedy pack PER SHARD — packing is
    * inherently sequential, so the parallelism unit is the shard and the
    * shard count is the scale knob (size shards so one shard's (id, len)
    * pairs fit a task: ~16 bytes/doc, so a million-doc shard is 16 MB).
    * An item longer than `capacity` opens its own bin and — its
    * remaining capacity being negative — never receives a second item:
    * oversize docs isolate naturally, no special case.
    *
    * Determinism (the oracle-replay contract): items sort by (n_tokens
    * DESC, id ASC); bins are probed in opening order; first fit wins.
    * Output: (doc_id, shard, n_tokens, bin_id) with bin_id 0-based and
    * shard-local — (shard, bin_id) is the global window key, exactly
    * like packingLayout's (shard, pack_id). */
  def ffdPacking(df: DataFrame, shard: Column, docId: Column,
      nTokens: Column, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val sp = df.sparkSession
    import sp.implicits._
    df.select(shard.cast("long").as("shard"),
        docId.cast("long").as("doc_id"),
        nTokens.cast("long").as("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (sh: Long, it: Iterator[(Long, Long, Long)]) =>
        val items = it.map { case (_, id, n) => (id, n) }.toArray
        java.util.Arrays.sort(items,
          Ordering.by[(Long, Long), (Long, Long)] { case (id, n) => (-n, id) })
        // remaining capacity per open bin, in opening order; FFD keeps
        // every bin open (a later small item may still fit an early bin)
        val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (id, n) =>
          var i = 0
          while (i < bins.length && bins(i) < n) i += 1
          if (i == bins.length) bins += (capacity - n) else bins(i) -= n
          (id, sh, n, i.toLong)
        }
      }
      .toDF("doc_id", "shard", "n_tokens", "bin_id")
  }

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

  /** Deterministic stratified QUOTA sample: keep exactly `quota` rows per
    * stratum (fewer when the stratum is smaller), chosen in portable-hash
    * order of `key` — a reproducible "random" draw that is independent of
    * partitioning and stable across engines, the property a training-mix
    * rebalancer needs (per-language caps, per-source caps).
    *
    * One shuffle (window on the stratum). A stratum's rows sort within a
    * single task, so this EXACT form is for strata that fit a task's sort
    * spill budget; for web-scale strata use [[stratifiedSampleThreshold]],
    * which needs no per-stratum sort. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      quota: Int): DataFrame = {
    require(quota >= 0, "quota must be >= 0")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
      .orderBy(Hashing.portableHash32(key), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Per-stratum quantile floor — the quality-curation step: keep rows
    * whose `score` reaches at least the `minPercentile` rank within their
    * stratum (e.g. drop each language's bottom decile by quality).
    * `percent_rank` gives ties identical ranks, so the cut is
    * deterministic regardless of row order. One shuffle (window on the
    * stratum); for web-scale strata swap the window for a broadcast of
    * per-stratum `approx_percentile` thresholds (the q11b sketch path —
    * same join shape as [[stratifiedSampleThreshold]]). */
  def stratifiedQuantileFilter(df: DataFrame, stratum: Column,
      score: Column, minPercentile: Double): DataFrame = {
    require(minPercentile >= 0.0 && minPercentile <= 1.0,
      "minPercentile must be in [0, 1]")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
      .orderBy(score)
    df.withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") >= minPercentile)
      .drop("__pr")
  }

  /** The SCALE form of stratified sampling: per stratum, keep rows whose
    * portable hash falls under `ceil(quota / n * 2^32)` — approximately
    * `quota` rows, no per-stratum sort, deterministic given the corpus.
    * One count aggregate (broadcast back as a join on the stratum) plus a
    * codegen'd per-row hash compare; strata of ANY size stream through. */
  def stratifiedSampleThreshold(df: DataFrame, stratum: Column, key: Column,
      quota: Int): DataFrame = {
    require(quota >= 0, "quota must be >= 0")
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val cutoff = ceil(lit(quota.toDouble * 4294967296.0) / col("__n"))
      .cast("long")
    df.join(broadcast(counts.select(col("__stratum"),
        least(cutoff, lit(4294967296L)).as("__cut"))),
        // null-safe: a null stratum is a stratum (the exact form samples
        // it via its window partition; a plain === would drop those rows)
        stratum <=> col("__stratum"))
      .filter(Hashing.portableHash32(key) < col("__cut"))
      .drop("__stratum", "__cut")
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis-Spirakis priority sampling): each row gets priority
    * u^(1/w) for a hash-derived uniform u in (0,1); the k largest
    * priorities are the sample, selected with probability proportional to
    * weight — temperature/importance sampling for corpus mixing, but
    * reproducible in any engine because u is the row key's portable hash,
    * not an RNG.
    *
    * Priorities compare by ln(u)/w (monotone in u^(1/w), no pow), and the
    * global top-k runs as TakeOrderedAndProject — per-partition heaps, no
    * global sort. Weights must be > 0; rows with null/zero/negative
    * weight are excluded. */
  def weightedSample(df: DataFrame, weight: Column, key: Column, k: Int,
      seed: String = "s42"): DataFrame = {
    require(k > 0, "k must be > 0")
    val u = (Hashing.portableHash32(
      concat(key.cast("string"), lit(":" + seed))).cast("double") + 0.5) /
      4294967296.0
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__pri", log(u) / weight.cast("double"))
      .orderBy(col("__pri").desc, key)
      .limit(k)
      .drop("__pri")
  }

  /** TOKEN-budget corpus mixing: keep a deterministic per-stratum document
    * sample whose EXPECTED token mass hits `budget` tokens per stratum —
    * the data-mixture rebalancing step of a training pipeline (cap the
    * dominant web source, keep all of a scarce one). Per stratum the keep
    * fraction is min(1, budget / stratum_tokens), applied as the same
    * portable hash threshold as [[stratifiedSampleThreshold]] — no
    * per-stratum sort, stable under corpus growth and across engines.
    *
    * One tiny aggregation (stratum -> token total, broadcast back) plus a
    * map-side filter: nothing here scales with the corpus except the scan.
    */
  def tokenBudgetMix(df: DataFrame, stratum: Column, key: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be > 0")
    val totals = df.groupBy(stratum.as("__stratum"))
      .agg(sum(tokens).as("__tok"))
    val frac = least(lit(1.0), lit(budget.toDouble) / col("__tok"))
    val cut = least(ceil(frac * 4294967296.0).cast("long"),
      lit(4294967296L))
    df.join(broadcast(totals.select(col("__stratum"), cut.as("__cut"))),
        stratum <=> col("__stratum"))
      .filter(Hashing.portableHash32(key) < col("__cut"))
      .drop("__stratum", "__cut")
  }

  /** Per-domain quota: keep at most `k` rows per `domain`, chosen by
    * ascending (portable hash of `key`, `key`) — the web-pipeline "cap any
    * single host at N pages" rule, deterministic across engines and runs
    * because rank is a hash, not arrival order.
    *
    * The naive form is `row_number() over (partition by domain order by
    * rank)` — one shuffle whose reduce side SORTS every row of the biggest
    * domain; at web scale one domain can be 1% of the corpus. This instead
    * aggregates with [[graft.functions.TopKPairsAgg]], whose state is
    * capped at k pairs everywhere in the partial-aggregation tree, so the
    * dominant domain costs map-side k-pair partials plus a k*partitions
    * merge — never a domain-sized sort or buffer. One hash-agg shuffle
    * total. `key` must be a long id (doc_id-shaped). */
  def domainQuota(df: DataFrame, domain: Column, key: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    val topk = graft.functions.TopKPairsAgg.topKPairs(k)
    val rank = Hashing.portableHash32(key.cast("string"))
    df.select(domain.as("domain"), rank.as("__rk"),
        key.cast("long").as("__id"))
      .groupBy(col("domain"))
      .agg(topk(col("__rk"), col("__id")).as("__top"))
      .select(col("domain"), explode(col("__top")).as("__e"))
      .select(col("domain"), col("__e._2").as("key"),
        col("__e._1").as("rank"))
  }
}
