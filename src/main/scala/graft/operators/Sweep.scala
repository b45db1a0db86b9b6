package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep-line analytics — the "max concurrent sessions /
  * connections / jobs" capacity metric, which is an ordered PREFIX SUM
  * over interval boundaries and therefore the one aggregate shape a
  * plain groupBy can never give (concurrency at t depends on every
  * boundary before t).
  *
  * The textbook form sorts ALL boundaries into one sequence and scans —
  * a single global window, the exact anti-pattern this repo's z3/t61
  * lessons exist to avoid. The scalable form here is the classic
  * SEGMENTED SCAN (two-level distributed prefix sum):
  *
  *   1. the corpus reduces to the DISTINCT boundary-instant domain with
  *      a net delta per instant (one hash agg; +1 at start, −1 at end,
  *      coincident boundaries collapse);
  *   2. level 1: in-bucket running sums under a window PARTITIONED by
  *      hour bucket — every partition is one hour of boundaries, never
  *      the corpus;
  *   3. level 2: bucket totals (one row per hour) get carry-in offsets
  *      under a window over the BUCKET DOMAIN only — bounded by the
  *      calendar (8.8k rows/year), broadcast-joined back.
  *
  * conc(t) = carry(bucket(t)) + run(t) equals the global cumulative sum
  * exactly, by associativity of +. At 100 TB the only corpus-sized
  * operations are the boundary-domain hash agg and hour-partitioned
  * windows; recurse the bucket hierarchy (hour → day → month) if the
  * bucket domain itself ever outgrows one partition.
  *
  * Reference has no interval algebra (SURVEY §2.2); this extends the
  * q15 binned range join / s36 interval join family with the
  * aggregate-over-time leg.
  */
object Sweep {

  /** Per-day concurrency profile of half-open intervals [start, end):
    * at instant e the interval is already closed — back-to-back
    * intervals [a,b) + [b,c) never double-count at b. Returns one row
    * per calendar day (UTC) holding any boundary instant:
    * (d, n_boundaries, bod_open, peak_conc, peak_at, eod_open):
    * concurrency is the right-continuous step function conc(t) =
    * Σ_{boundaries ≤ t} net; peak_conc is its max over the day's
    * boundary instants (post-delta) with peak_at the EARLIEST instant
    * attaining it (deterministic tie-break); bod_open is the carry
    * INTO the day (conc just before its first boundary) and eod_open
    * the carry out after its last. The continuous-time supremum over
    * the whole day is exactly greatest(bod_open, peak_conc) — a day
    * that only CLOSES carried-over intervals peaks at its open, not
    * at any boundary. Boundary instants whose +1/−1 coincide stay in
    * the domain with net 0 (counted in n_boundaries, concurrency
    * unchanged). Days with no boundary at all do not emit a row (their
    * sup is the neighboring carry, recoverable from eod_open). */
  def peakConcurrency(df: DataFrame, start: Column, end: Column)
      : DataFrame = {
    val b = df.select(start.as("t"), lit(1L).as("delta"))
      .unionByName(df.select(end.as("t"), lit(-1L).as("delta")))
      .groupBy(col("t")).agg(sum(col("delta")).as("net"))
      .withColumn("bucket", date_trunc("hour", col("t")))
    val w1 = Window.partitionBy(col("bucket")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = b.withColumn("run", sum(col("net")).over(w1))
    val btot = b.groupBy(col("bucket")).agg(sum(col("net")).as("tot"))
    // bucket-DOMAIN window only: calendar-bounded, never corpus-sized
    val w2 = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = btot
      .withColumn("carry", coalesce(sum(col("tot")).over(w2), lit(0L)))
      .select(col("bucket"), col("carry"))
    run.join(broadcast(carry), Seq("bucket"))
      .select(to_date(col("t")).as("d"), col("t"), col("net"),
        (col("carry") + col("run")).as("conc"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_boundaries"),
        min(struct(col("t").as("ft"),
          (col("conc") - col("net")).as("bo"))).as("__bod"),
        min(struct((-col("conc")).as("nc"), col("t").as("pt")))
          .as("__pk"),
        max(struct(col("t").as("lt"), col("conc").as("ec"))).as("__eod"))
      .select(col("d"), col("n_boundaries"),
        col("__bod.bo").as("bod_open"),
        (-col("__pk.nc")).as("peak_conc"),
        col("__pk.pt").as("peak_at"),
        col("__eod.ec").as("eod_open"))
  }

  /** INTERVAL COALESCING + COVERED TIME — the MEASURE leg of the
    * interval-algebra family ([[peakConcurrency]] asks "how many at
    * once", this asks "how much wall-clock was covered at all"): per
    * key, overlapping/touching half-open intervals [start, end) merge
    * into maximal ISLANDS (the classic running-max-end sweep: an
    * interval starts a new island iff its start exceeds the max end of
    * every earlier interval of the key), and the output is one row per
    * key — n_intervals, n_islands, covered_us (Σ island lengths — the
    * union measure, overlap counted once), span_us (last end − first
    * start) and the busiest island's length. Billed-time /
    * true-utilization / SLA-coverage arithmetic is exactly this
    * primitive, and it is NOT [[graft.streaming.Sessionize]]'s
    * gap-threshold clustering of point events — intervals carry their
    * own extent, and two long intervals may merge even when their
    * STARTS are far apart.
    *
    * Scale: one window per key ordered by start (partition = one key's
    * intervals — the s2 per-user posture; skewed keys are the caveat,
    * salt-split a pathological key by day first), then a plain
    * two-level groupBy. No global window anywhere. */
  def coalesceIntervals(df: DataFrame, key: Column, start: Column,
      end: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = df.select(key.as("k"), start.as("s"), end.as("e"))
      .withColumn("__pmax", max(col("e")).over(w))
      .withColumn("__new",
        when(col("__pmax").isNull || col("s") > col("__pmax"), 1L)
          .otherwise(0L))
    val w2 = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = flagged
      .withColumn("__isl", sum(col("__new")).over(w2))
      .groupBy(col("k"), col("__isl"))
      .agg(count(lit(1)).as("__n"), min(col("s")).as("__s"),
        max(col("e")).as("__e"))
    islands.groupBy(col("k"))
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(unix_micros(col("__e")) - unix_micros(col("__s")))
          .as("covered_us"),
        (max(unix_micros(col("__e"))) - min(unix_micros(col("__s"))))
          .as("span_us"),
        max(unix_micros(col("__e")) - unix_micros(col("__s")))
          .as("max_island_us"))
      .withColumnRenamed("k", "key")
  }
}
