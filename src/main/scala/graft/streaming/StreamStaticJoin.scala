package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-static join: enrich a stream against a static dimension that
  * is broadcast into every micro-batch — the standard "events × profile
  * table" shape (and the one streaming join class q51's stream-stream
  * join does NOT cover: the static side is planned per batch with no
  * state store and no watermark bookkeeping on the dim).
  *
  * The reference serves exactly this pattern when a streaming engine
  * reads a small side repeatedly: every micro-batch is an independent
  * chunked fetch of the same committed partition
  * (celeborn: CelebornShuffleReader.scala:364-394 chunked re-reads).
  * Spark-side the dim should be BROADCAST once per plan — at 100 TB of
  * events the static side must never force the stream to shuffle.
  *
  * q75: events streamed 2-files-per-trigger (same throttled layout as
  * q49), joined to a deterministic per-user segment dim (user_id mod 5
  * over the distinct users — derivable identically in SQL), counts and
  * value sums per (segment, event_type) in complete mode. The final
  * table must equal the batch join (DuckDB oracle); the ≥3-micro-batch
  * and broadcast-plan assertions live in StreamingSpec.
  */
object StreamStaticJoin {

  /** PUBLIC API — join a streaming frame to a static dim on `key`,
    * broadcasting the dim (stream side stays shuffle-free through the
    * join). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key))

  private def q75(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("segment", col("user_id") % 5)
    val src = RateLimited.sourceLayout(s, dir)
    val (result, _) = RateLimited.runThrottled(s, src, ev.schema,
      maxFilesPerTrigger = 2) { stream =>
      enrich(stream, dim, "user_id")
        .groupBy(col("segment"), col("event_type"))
        .agg(count(lit(1)).as("n"), graft.Canon.dsum(col("value"), 6).as("sum_value"))
    }
    result.orderBy(col("segment").asc_nulls_last, col("event_type").asc_nulls_last)
  }

  private val q75Sql =
    s"""WITH dim AS (SELECT DISTINCT user_id, user_id % 5 AS segment FROM events)
       |SELECT segment, event_type, COUNT(*) AS n,
       |  ${graft.Canon.sqlDsum("value", 6)} AS sum_value
       |FROM events JOIN dim USING (user_id)
       |GROUP BY segment, event_type
       |ORDER BY segment ASC NULLS LAST, event_type ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q75_stream_static_join", q75, Some(q75Sql)))
}
