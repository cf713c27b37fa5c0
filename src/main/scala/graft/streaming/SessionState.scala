package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the arbitrary
  * per-key state surface SURVEY §2B Q25 declares (the reference's
  * "spilled data, result data" ambition served by Spark's state store
  * instead of a remote worker; celeborn: README.md:5-7).
  *
  * Semantics: per-user sessionization with a 30-minute inactivity gap,
  * tracked by explicit state (count, sum, bounds) and emitted on
  * event-time timeout — the hand-rolled equivalent of
  * `session_window` + watermark, so q25_window_session is its oracle
  * (asserted in StreamingSpec).
  *
  * Scale notes: state is partitioned by user_id across executors (one
  * hash exchange), one `SessionAcc` per open session per user — bounded
  * by active users, not event volume; the watermark both drops late
  * events and garbage-collects timed-out state.
  */
object SessionState {

  /** One user event (input). */
  final case class UserEvent(ts: Timestamp, user_id: Long, value: Double)

  /** Accumulating per-user session state. */
  final case class SessionAcc(
      start: Long, lastTs: Long, nEvents: Long, sumValue: Double)

  /** One closed session (output). */
  final case class ClosedSession(
      user_id: Long, s_start: Timestamp, s_end: Timestamp,
      n_events: Long, sum_value: Double)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** State timestamps are MICROSECONDS — `Timestamp.getTime` is
    * millisecond-precision and would silently truncate the fixture's
    * microsecond event times (breaking parity with session_window). */
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Fold events into the open session; emit sessions closed by a gap.
    * Invoked per (user, new events) micro-batch slice and on timeout. */
  def updateUser(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[SessionAcc]): Iterator[ClosedSession] = {
    def close(a: SessionAcc): ClosedSession =
      ClosedSession(userId, fromMicros(a.start),
        fromMicros(a.lastTs + GapUs), a.nEvents, a.sumValue)

    if (events.isEmpty) {
      // event-time timeout: the watermark passed lastTs + gap → close
      val out = state.getOption.map(close).iterator.toSeq
      state.remove()
      return out.iterator
    }
    var acc = state.getOption.orNull
    val closed = Seq.newBuilder[ClosedSession]
    events.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
      val t = micros(e.ts)
      if (acc == null) acc = SessionAcc(t, t, 1L, e.value)
      else if (t - acc.lastTs >= GapUs) {
        closed += close(acc)
        acc = SessionAcc(t, t, 1L, e.value)
      } else acc = SessionAcc(acc.start, math.max(acc.lastTs, t),
        acc.nEvents + 1, acc.sumValue + e.value)
    }
    state.update(acc)
    // GroupState timeouts are millisecond-granular; round UP so the state
    // never times out before the true (microsecond) session close
    state.setTimeoutTimestamp(Math.floorDiv(acc.lastTs + GapUs + 999L, 1000L))
    closed.result().iterator
  }

  /** The streaming pipeline: watermark → groupByKey(user) →
    * flatMapGroupsWithState(EventTimeTimeout). */
  def sessionize(s: SparkSession, events: Dataset[UserEvent]): Dataset[ClosedSession] = {
    import s.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateUser)
  }
}
