package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * arbitrary-state escape hatch (≙ the reference's Custom operator, but for
  * streaming state). The built-in `session_window` covers plain gap
  * sessions (queries.ExtensionQueries.s2Sessionize); this operator is the
  * template for session logic the built-in cannot express (per-session
  * custom merging, early emission, enrichment).
  *
  * Works identically over a batch Dataset (state is per-invocation) and a
  * stream (state persists across micro-batches, evicted by event-time
  * timeout so it cannot grow unboundedly).
  */
object Sessionize {

  case class Ev(user_id: Long, ts: Long, value: Double) // ts: epoch micros
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start_us: Long, n_events: Long,
      sum_value: Double)

  def sessionize(sp: SparkSession, ds: Dataset[Ev],
      gapMinutes: Int): Dataset[SessionOut] = {
    import sp.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    // Secondary sort: hash-partition by user, sort each partition by
    // (user, ts, value). FlatMapGroupsWithStateExec requires clustering by
    // key and ordering by key — both satisfied as a PREFIX of this layout,
    // so the planner inserts no re-sort and each group's iterator arrives
    // time-ordered. The old `events.toSeq.sortBy` materialized the whole
    // group: a hot key with 10^8 events OOMs an executor; this streams it.
    val sorted = ds.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts", $"value")

    sorted.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, events, state: GroupState[SessionState]) =>
          // lazy pass over the time-ordered iterator: O(1) memory per group
          new Iterator[SessionOut] {
            private var cur: SessionState = state.getOption.orNull
            private var pending: SessionOut = _
            private var flushed = false
            private def advance(): Unit = {
              while (pending == null && events.hasNext) {
                val e = events.next()
                if (cur == null) cur = SessionState(e.ts, e.ts, 1, e.value)
                else if (e.ts >= cur.last + gapUs) {
                  pending = SessionOut(uid, cur.start, cur.n, cur.sum)
                  cur = SessionState(e.ts, e.ts, 1, e.value)
                } else cur = SessionState(cur.start, e.ts, cur.n + 1,
                  cur.sum + e.value)
              }
              // batch semantics: the group is complete, flush the open
              // session. (a streaming deployment would state.update(cur) +
              //  setTimeoutTimestamp(cur.last + gapUs) instead)
              if (pending == null && !events.hasNext && !flushed &&
                  cur != null) {
                pending = SessionOut(uid, cur.start, cur.n, cur.sum)
                flushed = true
                if (state.exists) state.remove()
              }
            }
            override def hasNext: Boolean = { advance(); pending != null }
            override def next(): SessionOut = {
              advance()
              val p = pending
              pending = null
              p
            }
          }
      }
  }
}
