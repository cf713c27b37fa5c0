package graft.streaming

import graft.{Canon, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Rate-limited streaming reads — Spark's pull-based analogue of the
  * reference's credit-based flow control
  * (celeborn: client-flink/common/.../RemoteBufferStreamReader.java:95-131,
  * worker/.../CreditStreamManager.java: a reader only receives as many
  * buffers as it has granted credits). Spark inverts the mechanism — the
  * source THROTTLES what each micro-batch may admit (`maxFilesPerTrigger`
  * for file sources, `maxOffsetsPerTrigger` for offset-based ones) — but
  * the guarantee under test is the same: bounded per-batch intake with
  * results identical to the unthrottled batch computation.
  *
  * At 100 TB the throttle is what keeps a backfill from admitting the
  * whole corpus into one micro-batch: state stores and shuffles stay
  * sized to `maxFilesPerTrigger × maxPartitionBytes`, not to the corpus.
  */
object RateLimited {

  /** Throttled file-stream read: each micro-batch admits at most
    * `maxFilesPerTrigger` files regardless of how many are pending. */
  def throttledStream(s: SparkSession, srcDir: String, schema: StructType,
      maxFilesPerTrigger: Int): DataFrame =
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)

  /** Run `agg` over a throttled stream of `srcDir` to completion
    * (AvailableNow: drain everything pending, honoring the throttle,
    * then stop) and return (result table, number of non-empty batches). */
  def runThrottled(s: SparkSession, srcDir: String, schema: StructType,
      maxFilesPerTrigger: Int, statePartitions: Int = 8)
      (agg: DataFrame => DataFrame): (DataFrame, Int) = {
    // state partitioning is captured from spark.sql.shuffle.partitions at
    // query start; every micro-batch commits one agg state store per
    // partition, so scope it to the streaming state size (tiny here) and
    // restore after — see StreamJoin.clickPurchasePairs for the same knob
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, statePartitions.toString)
    try {
      val tbl = "graft_rate_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = agg(throttledStream(s, srcDir, schema, maxFilesPerTrigger))
        .writeStream.format("memory").queryName(tbl)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      StreamMetrics.record(q)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      (s.table(tbl), batches)
    } finally s.conf.set(key, prev)
  }

  /** q49: events re-laid-out as 6 files, streamed 2 files per trigger
    * (3+ micro-batches), aggregated in complete mode — the final answer
    * must equal the plain batch aggregate (DuckDB oracle). The >=3
    * micro-batch progress assertion lives in StreamingSpec. */
  /** The 6-file re-layout of `events` is input preparation, not the
    * operator under test — memoize it per sf dir so repeated bench
    * iterations (and other streaming queries, e.g. q51) measure the
    * throttled read, not the rewrite. */
  private val srcLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Events of `dir` re-laid-out as 6 parquet files, built once per JVM. */
  def sourceLayout(s: SparkSession, dir: String): String =
    srcLayouts.computeIfAbsent(dir, { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft_rate_src").toString
      Tables.t(s, dir, "events").repartition(6).write.mode("overwrite").parquet(d)
      d
    })

  /** One event type of `dir` as its own 6-file stream source (a "topic"
    * per type — the two sides of a stream-stream join are independent
    * streams, and each side should scan only its own data). */
  def typedLayout(s: SparkSession, dir: String, eventType: String): String =
    srcLayouts.computeIfAbsent(s"$dir#$eventType", { _ =>
      val d = java.nio.file.Files.createTempDirectory(s"graft_rate_$eventType").toString
      Tables.t(s, dir, "events")
        .where(org.apache.spark.sql.functions.col("event_type") === eventType)
        .repartition(6).write.mode("overwrite").parquet(d)
      d
    })

  private def q49(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    val src = sourceLayout(s, dir)
    val (result, _) = runThrottled(s, src, ev.schema, maxFilesPerTrigger = 2) {
      _.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Canon.dsum(col("value"), 6).as("sum_value"))
    }
    result.orderBy(col("event_type").asc_nulls_last)
  }

  private val q49Sql =
    s"""SELECT event_type, COUNT(*) AS n, ${Canon.sqlDsum("value", 6)} AS sum_value
       |FROM events GROUP BY event_type
       |ORDER BY event_type ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q49_rate_limited", q49, Some(q49Sql)))
}
