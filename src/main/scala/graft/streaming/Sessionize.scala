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

    def flush(uid: Long, st: SessionState): SessionOut =
      SessionOut(uid, st.start, st.n, st.sum)

    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, events, state: GroupState[SessionState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts, e.value))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption.orNull
          sorted.foreach { e =>
            if (cur == null) cur = SessionState(e.ts, e.ts, 1, e.value)
            else if (e.ts >= cur.last + gapUs) {
              out += flush(uid, cur)
              cur = SessionState(e.ts, e.ts, 1, e.value)
            } else cur = SessionState(cur.start, e.ts, cur.n + 1,
              cur.sum + e.value)
          }
          // batch semantics: the group is complete, flush the open session.
          // (a streaming deployment would state.update(cur) +
          //  setTimeoutTimestamp(cur.last + gapUs) instead)
          if (cur != null) { out += flush(uid, cur); state.remove() }
          out.iterator
      }
  }
}
