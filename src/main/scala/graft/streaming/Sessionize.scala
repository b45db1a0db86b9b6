package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** Custom sessionization via the classic SECONDARY SORT: hash-partition by
  * user, sort each partition by (user, ts), walk the partition once with a
  * streaming iterator that closes a session on a user change or a gap. The
  * built-in `session_window` covers plain gap sessions
  * (queries.ExtensionQueries.s2Sessionize); this operator is the template
  * for session logic the built-in cannot express (per-session custom
  * merging, early emission, enrichment).
  *
  * Why mapPartitions and not groupByKey.flatMapGroupsWithState: for a typed
  * Dataset the groupByKey key is an APPENDED serialized column, so the
  * planner inserts a SECOND exchange + key-only sort after the manual
  * layout (verified by plan inspection) — and because that re-shuffle does
  * not preserve arrival order, the key-only re-sort loses the time order
  * the session walk needs. The mapPartitions form keeps exactly one
  * Exchange and one Sort (asserted in StreamingSpec), the sort genuinely
  * orders by (user, ts), and memory per group stays O(1) — a hot key with
  * 10^8 events streams through instead of materializing. The STREAMING
  * counterpart with persistent state is StreamOps' watermarked
  * session_window / dedup operators.
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

    ds.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts", $"value")
      .mapPartitions { it =>
        // lazy single pass over the (user, ts)-ordered partition:
        // O(1) memory regardless of group size
        new Iterator[SessionOut] {
          private var cur: SessionState = null
          private var curUid = 0L
          private var pending: SessionOut = _
          private def advance(): Unit = {
            while (pending == null && it.hasNext) {
              val e = it.next()
              if (cur == null) {
                curUid = e.user_id
                cur = SessionState(e.ts, e.ts, 1, e.value)
              } else if (e.user_id != curUid || e.ts >= cur.last + gapUs) {
                pending = SessionOut(curUid, cur.start, cur.n, cur.sum)
                curUid = e.user_id
                cur = SessionState(e.ts, e.ts, 1, e.value)
              } else cur = SessionState(cur.start, e.ts, cur.n + 1,
                cur.sum + e.value)
            }
            if (pending == null && !it.hasNext && cur != null) {
              pending = SessionOut(curUid, cur.start, cur.n, cur.sum)
              cur = null
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
