package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization of the event log — the offline twin
  * of the streaming session windows (q25, EventWindows): a session
  * breaks when a user is idle for `gapMinutes` or more (the same
  * boundary rule as Spark's `session_window` and the
  * `flatMapGroupsWithState` sessionizer, so batch and streaming agree
  * session-for-session: q60 == q25 asserted in CorpusOpsSpec, q25 ==
  * the custom-state sessionizer in StreamingSpec). Implemented as the
  * classic lag → new-session flag → running count pattern.
  *
  * Scale shape: both windows partition by `user_id` — per-user state
  * only, no global window — so the plan is one exchange on user_id
  * followed by two in-partition window passes and the aggregate (which
  * AQE coalesces into the same partitioning, no second shuffle). All
  * arithmetic is exact integer microseconds; no floats anywhere.
  */
object Sessionize {

  /** PUBLIC API — gap-based sessions over (user_id, ts, event_id).
    * Returns (user_id, session_idx, n_events, start_ts, end_ts, dur_us). */
  def sessionize(events: DataFrame, gapMinutes: Long = 30L): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("gap_us").isNull || col("gap_us") >= gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(runSum))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"))
      .withColumn("dur_us",
        unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
      .orderBy(col("user_id").asc_nulls_last, col("session_idx").asc_nulls_last)
  }

  private def q60(s: SparkSession, dir: String): DataFrame =
    sessionize(Tables.t(s, dir, "events"))

  private val q60Sql =
    """WITH l AS (SELECT user_id, ts, event_id,
      |  epoch_us(ts) - epoch_us(LAG(ts) OVER
      |    (PARTITION BY user_id ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST)) AS gap_us
      |  FROM events),
      |f AS (SELECT user_id, ts, event_id,
      |  CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END AS is_new FROM l),
      |s AS (SELECT user_id, ts,
      |  CAST(SUM(is_new) OVER (PARTITION BY user_id
      |    ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM f)
      |SELECT user_id, session_idx, COUNT(*)::BIGINT AS n_events,
      |  MIN(ts) AS start_ts, MAX(ts) AS end_ts,
      |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
      |FROM s GROUP BY user_id, session_idx
      |ORDER BY user_id ASC NULLS LAST, session_idx ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q60_batch_sessions", q60, Some(q60Sql)))
}
