package graft.streaming

import graft.{Canon, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming deduplication — exactly-once normalization of an
  * at-least-once delivery stream, the same guarantee the reference
  * enforces per-batch on its shuffle reads
  * (celeborn: client/src/main/java/org/apache/celeborn/client/read/CelebornInputStream.java:864-899,
  * which drops replayed `(mapId, batchId)` duplicates behind a winning
  * attempt filter). Here the stream-native form is watermarked
  * `dropDuplicatesWithinWatermark`: duplicate `event_id`s arriving
  * within the watermark horizon are dropped and the dedup state is
  * BOUNDED by that horizon — at 100 TB/day the state store holds one
  * key per event inside the 10-minute window, not the full history.
  *
  * The declared query (q36) is the batch equivalent with a DuckDB
  * oracle: a self-union simulates redelivery, `dropDuplicates` restores
  * exactly-once, and the aggregate proves multiset equality with the
  * clean input. The true streaming path over MemoryStream (duplicate
  * injection, watermark state expiry) runs in StreamingSpec.
  */
object StreamDedup {

  /** Stream-side transform: watermarked exactly-once on `event_id`. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  private def q36(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    // at-least-once redelivery: every event delivered twice
    val redelivered = ev.unionAll(ev)
    redelivered
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Canon.dsum(col("value"), 6).as("sum_value"))
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** Oracle over the CLEAN input: dedup of the doubled stream must
    * restore exactly the original multiset. */
  private val q36Sql =
    s"""SELECT event_type, COUNT(*) AS n, ${Canon.sqlDsum("value", 6)} AS sum_value
       |FROM events GROUP BY event_type
       |ORDER BY event_type ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q36_stream_dedup", q36, Some(q36Sql)))
}
