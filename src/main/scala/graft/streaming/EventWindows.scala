package graft.streaming

import graft.{Canon, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G6 — event-time windowing over the `events` table.
  *
  * The declared queries are the batch equivalents (same operators
  * Structured Streaming uses: `window`, `session_window`), which gives
  * them a DuckDB oracle; the true streaming path — readStream +
  * watermark + late-data semantics over MemoryStream — is exercised in
  * StreamingSpec with the batch results as ground truth. This mirrors
  * how the reference serves streaming engines through the same storage
  * plane (celeborn: Flink hybrid shuffle + credit-based reads,
  * client-flink/common/.../RemoteBufferStreamReader.java:95-131;
  * worker/.../storage/CreditStreamManager.java).
  *
  * Scale notes: event-time windows group by (window, key) — a single
  * hash exchange whose key-space is bounded by (time-range / slide ×
  * keys); session windows shuffle by user then sort-merge within
  * partitions. Watermarking bounds state; no driver collection.
  */
object EventWindows {

  /** Q24a tumbling 1-hour window × event_type counts + value sums. */
  private def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Canon.dsum(col("value"), 6).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("w_start").asc_nulls_last, col("event_type").asc_nulls_last)

  private val tumblingSql =
    s"""SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS w_start,
       |  event_type, COUNT(*) AS n, ${Canon.sqlDsum("value", 6)} AS sum_value
       |FROM events GROUP BY 1, 2
       |ORDER BY w_start ASC NULLS LAST, event_type ASC NULLS LAST""".stripMargin

  /** Q24b sliding window (1 hour, slide 30 min): each event lands in two
    * windows; the oracle replays the window arithmetic explicitly. */
  private def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
      .orderBy(col("w_start").asc_nulls_last, col("event_type").asc_nulls_last)

  private val slidingSql =
    """WITH b AS (
      |  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS w_start,
      |    event_type FROM events
      |  UNION ALL
      |  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
      |    - 1800000000) AS w_start, event_type FROM events)
      |SELECT w_start, event_type, COUNT(*) AS n FROM b GROUP BY 1, 2
      |ORDER BY w_start ASC NULLS LAST, event_type ASC NULLS LAST""".stripMargin

  /** Q25 session windows (30-minute gap) per user; the oracle computes
    * the same sessionization with the classic gaps-and-islands SQL. */
  private def sessions(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Canon.dsum(col("value"), 6).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id").asc_nulls_last, col("s_start").asc_nulls_last)

  private val sessionsSql =
    s"""WITH x AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS LAST)),
       |y AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC NULLS LAST
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM x)
       |SELECT user_id, MIN(ts) AS s_start, MAX(ts) + INTERVAL 30 MINUTE AS s_end,
       |  COUNT(*) AS n_events, ${Canon.sqlDsum("value", 6)} AS sum_value
       |FROM y GROUP BY user_id, sid
       |ORDER BY user_id ASC NULLS LAST, s_start ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q24_window_tumbling", tumbling, Some(tumblingSql)),
    QueryDef("q24_window_sliding", sliding, Some(slidingSql)),
    QueryDef("q25_window_session", sessions, Some(sessionsSql)))
}
