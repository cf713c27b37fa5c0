package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev tool (VERDICT r14 item 5): streaming SCALE evidence — per-micro-
  * batch wall and state-store curves for the stateful streaming
  * operators at sf1/sf10 under TIME-ORDERED throttled file streams.
  *
  * The registry entries deliberately run lateness-proof watermarks (35
  * days) over hash-ordered files so their answers stay bit-equal to
  * their batch oracles — which retains ALL state by design. The
  * scaladocs' production claim — state plateaus at the watermark
  * horizon — is only measurable under time-ordered arrival and an
  * SLA-sized watermark. This harness:
  *
  *  1. re-lays events out as K time-RANGE files written sequentially
  *     (arrival order = event-time order, the production shape);
  *  2. streams them 1 file/trigger through each stateful operator with
  *     a production watermark (1 day against the fixture's 30-day
  *     span; 10 minutes for dedup — its documented horizon);
  *  3. prints one STREAM_CURVE line per micro-batch (trigger wall,
  *     input rows, state rows/bytes, watermark) and a STREAM_PLATEAU
  *     verdict per query: max state over the last third of batches vs
  *     the global max — flat-after-horizon means ratio ≈ 1 and the
  *     global max is reached early, NOT at the end (a monotone curve
  *     is the unbounded-state failure the claim rules out).
  *
  * `runMain graft.StreamScaleAb` over SPARK_GRAFT_SF_DIR. Results are
  * ledgered in BASELINE.md (r15 streaming-scale section).
  */
object StreamScaleAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "24").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.t(spark, sfDir, "events")
    val schema = ev.schema
    val n = ev.count()
    println(s"STREAM_SCALE sf=$sfDir events=$n files=$k")

    /** `df` as K time-range parquet files named in range order and
      * written sequentially, so a file stream admits them oldest-first
      * (FileStreamSource orders by timestamp then path; both agree). */
    def timeOrdered(df: DataFrame, tag: String): String = {
      val out = java.nio.file.Files.createTempDirectory(s"graft_tord_$tag")
      val b = df.agg(min(col("ts").cast("double")),
        max(col("ts").cast("double"))).head()
      val (lo, hi) = (b.getDouble(0), b.getDouble(1) + 1.0)
      val e = col("ts").cast("double")
      for (i <- 0 until k) {
        val (a, z) = (lo + (hi - lo) * i / k, lo + (hi - lo) * (i + 1) / k)
        val tmp = java.nio.file.Files.createTempDirectory(s"graft_tord_w")
        df.where(e >= a && e < z).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.toFile.listFiles()
          .find(_.getName.endsWith(".parquet")).get.toPath
        java.nio.file.Files.move(part,
          out.resolve(f"$i%03d.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      out.toString
    }

    /** Drain `q`'s progress into curve lines + a plateau verdict. */
    def curve(name: String,
        q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val ps = q.recentProgress.filter(_.numInputRows > 0)
      ps.foreach { p =>
        val trig = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(-1L)
        val sRows = p.stateOperators.map(_.numRowsTotal).sum
        val sMem = p.stateOperators.map(_.memoryUsedBytes).sum
        val wm = Option(p.eventTime.get("watermark")).getOrElse("-")
        println(f"STREAM_CURVE q=$name batch=${p.batchId} trig_ms=$trig " +
          f"in_rows=${p.numInputRows} state_rows=$sRows " +
          f"state_mb=${sMem / 1e6}%.1f wm=$wm")
      }
      val rows = ps.map(_.stateOperators.map(_.numRowsTotal).sum)
      if (rows.nonEmpty && rows.max > 0) {
        // plateau verdict (ADVICE r15): tail_max / global max is 1.00
        // for MONOTONIC GROWTH too (the last third always holds the
        // global max), so the discriminating ratio is tail max over the
        // max of the FIRST two-thirds — a plateau reads ≈ 1.00, while
        // unbounded state reads the tail's continued growth (> 1) —
        // plus the argmax batch index, which a plateau parks early-to-
        // anywhere but growth pins to the final batch.
        val head = rows.take(math.max(1, rows.length * 2 / 3))
        val tail = rows.drop(rows.length * 2 / 3)
        val walls = ps.map(p => Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)).sorted
        val argmax = rows.indexOf(rows.max)
        println(f"STREAM_PLATEAU q=$name batches=${rows.length} " +
          f"state_max=${rows.max} tail_max=${if (tail.isEmpty) 0L else tail.max} " +
          f"ratio_tail_vs_head=${(if (tail.isEmpty) 0L else tail.max).toDouble / head.max}%.2f " +
          f"argmax_batch=$argmax/${rows.length - 1} " +
          f"batch_median_ms=${walls(walls.length / 2)}")
      }
    }

    /** Run `xf` over a 1-file/trigger stream of `src` to a named noop
      * sink with streaming state scoped to 8 partitions (the
      * RateLimited/StreamJoin knob), AvailableNow to completion. */
    def run(name: String, src: String)(xf: DataFrame => DataFrame): Unit = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "8")
      try {
        val q = xf(streaming.RateLimited.throttledStream(spark, src, schema, 1))
          .writeStream.format("noop").queryName(s"ssa_$name")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        curve(name, q)
      } catch { case e: Throwable =>
        println(s"STREAM_CURVE q=$name FAILED: ${e.getMessage}")
      } finally spark.conf.set(key, prev)
    }

    val all = timeOrdered(ev, "all")

    // q36's true streaming path: exactly-once inside the 10-minute
    // documented horizon — state is the keys of the last ~10 minutes
    run("dedup_wm10m", all)(streaming.StreamDedup.dedup)

    // watchdog trio, 1-day windows + 1-day watermark: open-window state
    // is bounded by (groups x ~2 days), whatever the corpus size
    val split = ev.agg(date_add(min(to_date(col("ts"))), 14)).head().getDate(0)
    val baseline = streaming.StreamDrift.fitBaseline(
      ev.where(to_date(col("ts")) < lit(split))
        .select(col("event_type").as("g"), col("value").as("x")))
      .localCheckpoint()
    run("drift_q158", all)(df => streaming.StreamDrift.watch(
      df.select(col("event_type").as("g"), col("ts"), col("value").as("x")),
      baseline))
    run("corr_q168", all)(df => streaming.StreamAssoc.watch(
      df.select(col("event_type").as("g"), col("ts"),
        col("value").as("x"),
        get_json_object(col("props"), "$.k").cast("double").as("y"))))
    run("slope_q178", all)(df => streaming.StreamSlope.watch(
      df.select(col("event_type").as("g"), col("ts"), col("value").as("v"))))

    // q51's stream-stream join at a 1-day SLA watermark (the registry
    // entry's 35-day delay is the oracle-parity setting): per-side
    // buffered state must plateau at ~(1 day + 5 min) of events
    val clicks = timeOrdered(ev.where(col("event_type") === "click"), "click")
    val purchases = timeOrdered(ev.where(col("event_type") === "purchase"), "purch")
    locally {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "8")
      try {
        def side(src: String, tsAlias: String) =
          streaming.RateLimited.throttledStream(spark, src, schema, 1)
            .select(col("user_id"), col("ts").as(tsAlias), col("event_id"))
            .withWatermark(tsAlias, "1 day")
        val joined = side(clicks, "click_ts")
          .withColumnRenamed("event_id", "click_id")
          .join(side(purchases, "p_ts")
              .withColumnRenamed("user_id", "p_user")
              .withColumnRenamed("event_id", "purchase_id"),
            col("user_id") === col("p_user") &&
              col("p_ts") > col("click_ts") &&
              col("p_ts") <= col("click_ts") + expr("INTERVAL 5 MINUTES"))
        val q = joined.writeStream.format("noop").queryName("ssa_join_q51")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        curve("join_q51_wm1d", q)
      } catch { case e: Throwable =>
        println(s"STREAM_CURVE q=join_q51_wm1d FAILED: ${e.getMessage}")
      } finally spark.conf.set(key, prev)
    }

    // q89's merge stream: stateless foreachBatch (no state store) — the
    // curve of interest is per-batch merge wall as the target grows
    locally {
      val target = java.nio.file.Files
        .createTempDirectory("graft_ssa_upsert").toString + "/t"
      val changes = streaming.RateLimited.throttledStream(spark, all, schema, 1)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
      val q = streaming.StreamUpsert.runMergeStream(
        spark, changes, target, "user_id", "ts")
      q.processAllAvailable()
      q.stop()
      curve("upsert_q89", q)
    }

    spark.stop()
  }
}
