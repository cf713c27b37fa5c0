package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** True Structured-Streaming semantics for G6: the batch-equivalent
  * queries (q24/q25, DuckDB-oracle-checked) are ground truth; here the
  * same aggregations run through MemoryStream with watermarks, verifying
  * incremental emission and late-data dropping.
  */
case class Ev(ts: Timestamp, event_type: String, value: Double)
case class UEv(ts: Timestamp, user_id: Long)
case class IdEv(event_id: Long, ts: Timestamp, event_type: String, value: Double)
case class CdcEv(user_id: Long, ts: Timestamp, event_id: Long,
    event_type: String, value: Double)
case class XyEv(ts: Timestamp, g: String, x: Double, y: Double)

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  // aligned to a 10-minute window boundary (1700000400000 % 600000 == 0)
  private val Base = 1700000400000L

  private def t(minutes: Long): Timestamp =
    new Timestamp(Base + minutes * 60000L)

  test("tumbling window over a stream matches the batch equivalent") {
    import spark.implicits._
    val events = Tables.t(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq

    val stream = MemoryStream[Ev](spark, 1)
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("tumbling_out").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      // sentinel far in the future pushes the watermark past all windows
      stream.addData(Ev(new Timestamp(events.map(_.ts.getTime).max + 86400000L), "zz", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("tumbling_out")
      .where(col("event_type") =!= "zz")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q24_window_tumbling")(spark, sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} windows vs batch ${batch.size}")
  }

  test("stream drift watchdog emits exactly the batch twin's daily TVD rows") {
    import spark.implicits._
    // the q158 split: baseline = first fortnight, stream = the rest
    val all = Tables.t(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value")).as[Ev].collect().toSeq
    val splitMs = java.sql.Timestamp.valueOf("2024-01-16 00:00:00").getTime
    val baseline = streaming.StreamDrift.fitBaseline(
      Tables.t(spark, sf, "events")
        .where(to_date(col("ts")) < lit("2024-01-16").cast("date"))
        .select(col("event_type").as("g"), col("value").as("x")))
    val live = all.filter(_.ts.getTime >= splitMs)

    val stream = MemoryStream[Ev](spark, 11)
    val out = streaming.StreamDrift.watch(
      stream.toDF().select(col("event_type").as("g"), col("ts"),
        col("value").as("x")),
      baseline)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("drift_out").start()
    try {
      // two arbitrary micro-batches: histogram merge must be batching-
      // independent
      val (b1, b2) = live.splitAt(live.size / 3)
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      stream.addData(Ev(new Timestamp(live.map(_.ts.getTime).max + 3 * 86400000L), "zz", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("drift_out")
      .where(col("g") =!= "zz")
      .collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q158_stream_drift")(spark, sf)
      .collect()
      .map(r => (r.getDate(1).toString, r.getString(0), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch,
      s"streamed drift ${streamed.size} rows != batch twin ${batch.size}")
  }

  test("stream correlation watchdog emits exactly the batch twin's daily rows") {
    import spark.implicits._
    // the full fixture through the streaming leg in two arbitrary
    // micro-batches: scalar moment sums must be batching-independent
    val all = Tables.t(spark, sf, "events")
      .select(col("ts"), col("event_type").as("g"), col("value").as("x"),
        get_json_object(col("props"), "$.k").cast("double").as("y"))
      .as[XyEv].collect().toSeq

    val stream = MemoryStream[XyEv](spark, 12)
    val out = streaming.StreamAssoc.watch(stream.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("corr_out").start()
    try {
      val (b1, b2) = all.splitAt(all.size / 3)
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      stream.addData(XyEv(
        new Timestamp(all.map(_.ts.getTime).max + 3 * 86400000L), "zz", 0.0, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("corr_out")
      .where(col("g") =!= "zz")
      .collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
        r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q168_stream_corr")(spark, sf)
      .collect()
      .map(r => (r.getDate(1).toString, r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(streamed == batch,
      s"streamed corr ${streamed.size} rows != batch twin ${batch.size}")
  }

  test("stream slope watchdog emits exactly the batch twin's daily rows") {
    import spark.implicits._
    // the full fixture through the streaming leg in two arbitrary
    // micro-batches: the five scalar moment sums are decimal-exact and
    // order-free, so the split cannot move any slope
    val all = Tables.t(spark, sf, "events")
      .select(col("ts"), col("event_type").as("g"), col("value").as("v"))
      .as[(java.sql.Timestamp, String, Double)].collect().toSeq

    val stream = MemoryStream[(java.sql.Timestamp, String, Double)](spark, 14)
    val out = streaming.StreamSlope.watch(
      stream.toDF().toDF("ts", "g", "v"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("slope_out").start()
    try {
      val (b1, b2) = all.splitAt(all.size / 4)
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
      stream.addData((new Timestamp(
        all.map(_._1.getTime).max + 3 * 86400000L), "zz", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("slope_out")
      .where(col("g") =!= "zz")
      .collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
        r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q178_stream_slope")(spark, sf)
      .collect()
      .map(r => (r.getDate(1).toString, r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(streamed == batch,
      s"streamed slope ${streamed.size} rows != batch twin ${batch.size}")
  }

  /** Restart fault-injection harness for the watchdog trio (VERDICT
    * r12 #5): deliver the fixture through a FILE source in three
    * phases whose cuts land INSIDE a day's window (so stateful
    * in-window aggregates must survive in the checkpointed state
    * store), restart the query from its checkpoint between phases,
    * inject one IDLE restart that must append nothing (the offset-log
    * replay protocol: an in-flight batch is re-run after a crash, but
    * the file sink's transaction log keeps the emit exactly-once), and
    * return the final sink. q36/q89 prove restart for dedup/upsert
    * state; this is the same proof for the windowed-aggregate state
    * the watchdogs carry. */
  private def restartHarness(input: org.apache.spark.sql.DataFrame,
      sentinel: org.apache.spark.sql.DataFrame,
      watch: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      cuts: (String, String) = ("2024-01-12 11:00:00", "2024-01-22 13:00:00"))
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("graft_rst_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rst_ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_rst_out").toString
    def runOnce(): Unit = {
      val q = watch(spark.readStream.schema(input.schema)
          .option("maxFilesPerTrigger", 1).parquet(src))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // phase cuts at 11:00/13:00 — mid-window by construction
    val cut1 = lit(cuts._1).cast("timestamp")
    val cut2 = lit(cuts._2).cast("timestamp")
    input.where(col("ts") < cut1)
      .repartition(2).write.mode("append").parquet(src)
    runOnce()
    val afterP1 = spark.read.parquet(out).count()
    assert(afterP1 > 0, "phase 1 must close at least one window")
    runOnce() // kill/restart with no new input: nothing may re-emit
    assert(spark.read.parquet(out).count() == afterP1,
      "idle restart re-emitted closed windows")
    input.where(col("ts") >= cut1 && col("ts") < cut2)
      .repartition(2).write.mode("append").parquet(src)
    runOnce()
    input.where(col("ts") >= cut2).unionByName(sentinel)
      .repartition(2).write.mode("append").parquet(src)
    runOnce()
    spark.read.parquet(out)
  }

  test("q158 drift watchdog: mid-window restarts from checkpoint leave " +
      "closed-window TVDs exactly the batch twin's") {
    val baseline = streaming.StreamDrift.fitBaseline(
      Tables.t(spark, sf, "events")
        .where(to_date(col("ts")) < lit("2024-01-16").cast("date"))
        .select(col("event_type").as("g"), col("value").as("x")))
    val live = Tables.t(spark, sf, "events")
      .where(to_date(col("ts")) >= lit("2024-01-16").cast("date"))
      .select(col("ts"), col("event_type").as("g"), col("value").as("x"))
    val maxTs = live.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        new Timestamp(maxTs.getTime + 3 * 86400000L), "zz", 0.0)),
      live.schema)
    val sink = restartHarness(live, sentinel,
      in => streaming.StreamDrift.watch(
        in.select(col("g"), col("ts"), col("x")), baseline),
      // the watched half starts 01-16; cuts must land inside it
      cuts = ("2024-01-20 11:00:00", "2024-01-26 13:00:00"))
    val streamed = sink.where(col("g") =!= "zz").collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q158_stream_drift")(spark, sf)
      .collect()
      .map(r => (r.getDate(1).toString, r.getString(0), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch,
      s"restarted drift sink ${streamed.size} rows != batch ${batch.size}")
  }

  test("q168 correlation watchdog: mid-window restarts from checkpoint " +
      "leave closed-window correlations exactly the batch twin's") {
    val live = Tables.t(spark, sf, "events")
      .select(col("ts"), col("event_type").as("g"), col("value").as("x"),
        get_json_object(col("props"), "$.k").cast("double").as("y"))
    val maxTs = live.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        new Timestamp(maxTs.getTime + 3 * 86400000L), "zz", 0.0, 0.0)),
      live.schema)
    val sink = restartHarness(live, sentinel,
      in => streaming.StreamAssoc.watch(in))
    val streamed = sink.where(col("g") =!= "zz").collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
        r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q168_stream_corr")(spark, sf)
      .collect()
      .map(r => (r.getDate(1).toString, r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(streamed == batch,
      s"restarted corr sink ${streamed.size} rows != batch ${batch.size}")
  }

  test("q178 slope watchdog: mid-window restarts from checkpoint leave " +
      "closed-window slopes exactly the batch twin's") {
    val live = Tables.t(spark, sf, "events")
      .select(col("ts"), col("event_type").as("g"), col("value").as("v"))
    val maxTs = live.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        new Timestamp(maxTs.getTime + 3 * 86400000L), "zz", 0.0)),
      live.schema)
    val sink = restartHarness(live, sentinel,
      in => streaming.StreamSlope.watch(in))
    val streamed = sink.where(col("g") =!= "zz").collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
        r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q178_stream_slope")(spark, sf)
      .collect()
      .map(r => (r.getDate(1).toString, r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(streamed == batch,
      s"restarted slope sink ${streamed.size} rows != batch ${batch.size}")
  }

  test("watermark drops late data in append mode") {
    import spark.implicits._
    val stream = MemoryStream[Ev](spark, 2)
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      // window [0,10): two on-time events; watermark advances to 80-10=70
      stream.addData(Ev(t(0), "a", 1.0), Ev(t(9), "a", 1.0), Ev(t(80), "b", 1.0))
      q.processAllAvailable()
      // late arrival for the long-closed [0,10) window → dropped
      stream.addData(Ev(t(5), "a", 1.0))
      q.processAllAvailable()
      // flush remaining windows
      stream.addData(Ev(t(600), "zz", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_out")
      .collect().map(r =>
        ((r.getTimestamp(0).getTime - Base) / 60000L, r.getString(1)) ->
          r.getLong(2)).toMap
    assert(out((0L, "a")) == 2L, s"late row must not count: $out")
  }

  test("flatMapGroupsWithState sessionization matches the session_window oracle") {
    import spark.implicits._
    import graft.streaming.SessionState
    import graft.streaming.SessionState.UserEvent
    val events = Tables.t(spark, sf, "events")
      .select(col("ts"), col("user_id"), col("value"))
      .as[UserEvent].collect().toSeq

    val stream = MemoryStream[UserEvent](spark, 4)
    val q = SessionState.sessionize(spark, stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("fmgws_out").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      // push the watermark past every open session so timeouts fire
      stream.addData(UserEvent(
        new Timestamp(events.map(_.ts.getTime).max + 86400000L), -1L, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("fmgws_out")
      .where(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    val batch = SparkEntry.queries("q25_window_session")(spark, sf)
      .select(col("user_id"), col("s_start"), col("s_end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(streamed == batch,
      s"custom-state sessions ${streamed.size} vs session_window ${batch.size}; " +
        s"only-streamed=${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
  }

  test("stream-stream interval join matches the batch interval join") {
    import spark.implicits._
    val events = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)].collect().toSeq

    val left = MemoryStream[(Long, Timestamp, Long, String)](spark, 6)
    val right = MemoryStream[(Long, Timestamp, Long, String)](spark, 7)
    val l = left.toDF().toDF("a_id", "a_ts", "a_user", "a_type")
      .withWatermark("a_ts", "10 minutes")
    val r = right.toDF().toDF("b_id", "b_ts", "b_user", "b_type")
      .withWatermark("b_ts", "10 minutes")
    val joined = l.join(r,
      col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("a_id"), col("b_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      left.addData(events)
      right.addData(events)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ssj_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.t(spark, sf, "events")
    val batch = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") > col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("a.event_id"), col("b.event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"stream-stream join ${streamed.size} pairs vs batch ${batch.size}")
  }

  test("stream dedup drops watermark-window duplicates, keeps each id once") {
    import spark.implicits._
    val stream = MemoryStream[IdEv](spark, 5)
    val q = graft.streaming.StreamDedup.dedup(stream.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      // at-least-once delivery: id 1 twice in one batch, id 2 across
      // batches, id 3 three times; ids 4-5 clean
      stream.addData(
        IdEv(1, t(0), "a", 1.0), IdEv(1, t(0), "a", 1.0),
        IdEv(2, t(1), "b", 2.0), IdEv(3, t(2), "c", 3.0))
      q.processAllAvailable()
      stream.addData(
        IdEv(2, t(1), "b", 2.0), IdEv(3, t(2), "c", 3.0),
        IdEv(3, t(2), "c", 3.0), IdEv(4, t(3), "d", 4.0))
      q.processAllAvailable()
      stream.addData(IdEv(5, t(600), "zz", 0.0)) // advance watermark
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("dedup_out").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L, 4L, 5L),
      s"each id exactly once, got $ids")
  }

  test("foreachBatch sink: streamed windows land in parquet equal to batch") {
    import spark.implicits._
    val events = Tables.t(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_fb_sink").toString

    val stream = MemoryStream[Ev](spark, 8)
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    // the production sink shape: append-mode batches written as parquet,
    // idempotent per epoch via deterministic file naming under the dir
    val q = agg.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }.start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      stream.addData(Ev(new Timestamp(events.map(_.ts.getTime).max + 86400000L), "zz", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val sunk = spark.read.parquet(outDir)
      .where(col("event_type") =!= "zz")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q24_window_tumbling")(spark, sf)
      .select(col("w_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(sunk == batch, s"sink ${sunk.size} windows vs batch ${batch.size}")
  }

  test("foreachBatch CDC merge: any micro-batching converges, merges are idempotent") {
    import spark.implicits._
    import graft.streaming.StreamUpsert
    val log = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
    val expected = StreamUpsert.latestState(log, "user_id", "ts")
      .drop("n_changes").collect().map(_.toSeq).toSet
    def state(dir: String): Set[Seq[Any]] =
      spark.read.parquet(dir)
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect().map(_.toSeq).toSet
    val rows = log.as[CdcEv].collect().toSeq

    // batch-boundary invariance: 3 deliveries vs 1 delivery, same table
    val dirA = java.nio.file.Files.createTempDirectory("graft_cdc_a").toString
    val parts = rows.groupBy(_.event_id % 3).toSeq.sortBy(_._1).map(_._2)
    parts.foreach(p =>
      StreamUpsert.mergeBatch(spark, p.toDF(), dirA, "user_id", "ts"))
    assert(state(dirA) == expected, "3-batch merge diverged from batch kernel")
    val dirB = java.nio.file.Files.createTempDirectory("graft_cdc_b").toString
    StreamUpsert.mergeBatch(spark, rows.toDF(), dirB, "user_id", "ts")
    assert(state(dirB) == expected, "1-batch merge diverged from batch kernel")

    // idempotence: re-delivering the last batch must be a no-op
    StreamUpsert.mergeBatch(spark, parts.last.toDF(), dirA, "user_id", "ts")
    assert(state(dirA) == expected, "replayed batch changed the table")

    // end-to-end: the foreachBatch stream converges to the same table
    val dirC = java.nio.file.Files.createTempDirectory("graft_cdc_c").toString
    val stream = MemoryStream[CdcEv](spark, 9)
    val q = StreamUpsert.runMergeStream(spark, stream.toDF(), dirC, "user_id", "ts")
    try {
      val (h, t2) = rows.splitAt(rows.size / 2)
      stream.addData(h); q.processAllAvailable()
      stream.addData(t2); q.processAllAvailable()
    } finally q.stop()
    assert(state(dirC) == expected, "streamed merge diverged from batch kernel")
  }

  test("transformWithState threshold alerts match the batch twin exactly") {
    import spark.implicits._
    import graft.streaming.ThresholdAlert
    import ThresholdAlert.SpendEvent
    val rows = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[SpendEvent]
      .collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val expected = SparkEntry.queries("q93_threshold_alerts")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(expected.nonEmpty, "threshold should split the fixture's users")
    // the v2 API requires the RocksDB state store; provider is read at
    // query start, so set it for this query only and restore after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[SpendEvent](spark, 10)
      val q = ThresholdAlert.alerts(stream.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_alerts").start()
      try {
        // three in-(ts)-order deliveries: per-key monotone across batches
        rows.grouped(rows.size / 3 + 1).foreach { b =>
          stream.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table("tws_alerts").collect().map(_.toSeq).toSet
      assert(got == expected, s"streamed=${got.size} batch=${expected.size}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("session window over a stream matches the batch equivalent") {
    import spark.implicits._
    val events = Tables.t(spark, sf, "events")
      .select(col("ts"), col("user_id")).as[(Timestamp, Long)]
      .collect().toSeq.map { case (ts, u) => UEv(ts, u) }

    val stream = MemoryStream[UEv](spark, 3)
    val agg = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n_events"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("session_out").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      stream.addData(UEv(new Timestamp(events.map(_.ts.getTime).max + 86400000L), -1L))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("session_out")
      .where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q25_window_session")(spark, sf)
      .select(col("user_id"), col("s_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} sessions vs batch ${batch.size}")
  }

  test("maxFilesPerTrigger throttles intake into >=3 micro-batches, result batch-identical") {
    // credit-based flow-control analogue (graft.streaming.RateLimited):
    // 6 files admitted 1 per trigger must take >=3 non-empty micro-batches
    // and still produce exactly the unthrottled batch aggregate
    val ev = Tables.t(spark, sf, "events")
    val src = java.nio.file.Files.createTempDirectory("graft_rate_spec").toString
    ev.repartition(6).write.mode("overwrite").parquet(src)
    val (result, batches) =
      graft.streaming.RateLimited.runThrottled(spark, src, ev.schema, 1) {
        _.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), Canon.dsum(col("value"), 6).as("sum_value"))
      }
    assert(batches >= 3, s"expected >=3 throttled micro-batches, got $batches")
    val streamed = result.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Canon.dsum(col("value"), 6).as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, "throttled stream result differs from batch")
  }

  test("restart from checkpoint resumes offsets and restores dedup state exactly-once") {
    // The reference's recovery story is re-fetch/re-register around a
    // persistent shuffle layout; Structured Streaming's is the
    // checkpoint: offsets (which files were admitted) + state store
    // (which ids were seen) both survive a query restart. Phase 2
    // re-delivers EVERY phase-1 id in fresh files — only restored state
    // can keep them out of the sink.
    import org.apache.spark.sql.streaming.Trigger
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val src = java.nio.file.Files.createTempDirectory("graft_ckpt_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_meta").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    def runOnce(): Unit = {
      val q = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2).parquet(src)
        .dropDuplicates("event_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // phase 1: the even half of the corpus
    ev.where(col("event_id") % 2 === 0).repartition(3)
      .write.mode("append").parquet(src)
    runOnce()
    val phase1 = spark.read.parquet(out).count()
    assert(phase1 == ev.where(col("event_id") % 2 === 0).count(),
      "phase 1 must emit each even id exactly once")
    // phase 2: the FULL corpus again in new files (every even id is a
    // redelivery; odd ids are new)
    ev.repartition(3).write.mode("append").parquet(src)
    runOnce()
    val result = spark.read.parquet(out)
    assert(result.count() == ev.count(),
      s"restart emitted duplicates or lost rows: ${result.count()} vs ${ev.count()}")
    assert(result.select(col("event_id")).distinct().count() == ev.count(),
      "sink must hold each event id exactly once across the restart")
  }

  test("stream-stream click->purchase join emits exactly the batch interval-join pairs") {
    val ev = Tables.t(spark, sf, "events")
    val clickSrc = graft.streaming.RateLimited.typedLayout(spark, sf, "click")
    val purchaseSrc = graft.streaming.RateLimited.typedLayout(spark, sf, "purchase")
    val pairs = graft.streaming.StreamJoin
      .clickPurchasePairs(spark, clickSrc, purchaseSrc, ev.schema,
        "35 days", maxFilesPerTrigger = 2)
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .collect().map(_.toString).sorted.toSeq
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") > col("click_ts") &&
          col("p_ts") <= col("click_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .collect().map(_.toString).sorted.toSeq
    assert(pairs.nonEmpty, "fixture must produce at least one attribution pair")
    assert(pairs == batch, "streamed join pairs differ from batch interval join")
  }
}
