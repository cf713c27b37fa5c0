package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Round-11: the STREAMING DRIFT WATCHDOG — the production shape of
  * the q153/q156 monitors: a fitted per-group baseline histogram is
  * broadcast to the stream, each event-time tumbling window aggregates
  * its own histogram, and every closed window emits its TVD against
  * the baseline — "page the curator the day the new crawl's value
  * distribution moves". The reference's analogue is its per-batch
  * metrics plane; drift belongs ON the ingest stream because by the
  * time a batch profile runs, the skewed data has already landed.
  *
  * Engine mechanics worth the name: the per-window histogram is a
  * custom typed [[Aggregator]] (`Array[Long]` buffer, one slot per
  * bin) registered via `functions.udaf` — the ONE streaming-legal way
  * to produce a per-window count VECTOR, since a second groupBy over
  * (window, bin) rows would be a forbidden chained streaming
  * aggregation. State per open window is one 256-long array (~2 KB)
  * per (window, group), bounded by the watermark horizon; the baseline
  * is a broadcast stream-static join on both sides of the aggregate.
  *
  * Determinism/oracle: the TVD fold is PURE INTEGER —
  * TVD = ½·Σ|cnt_i·nb − bcnt_i·n| / (n·nb) — so the `aggregate` HOF
  * accumulates exact longs (no decimal-precision promotion, no float
  * fold order) and the streaming leg, the q158 batch twin, and the
  * DuckDB oracle (same sum via the q156 contribution-union) agree
  * bit-for-bit after one identical double expression + 6-dp round.
  * Bound: exact while n·nb < 2^63, i.e. each side under ~3e9 rows per
  * (group, window) — beyond that, pre-aggregate windows finer.
  * Out-of-baseline-range values clamp into the edge bins (the
  * watchdog's whole point is seeing mass pile up at an edge). */
/* Reference anchor: celeborn surfaces per-worker metric histograms over
 * its metrics plane (common/.../metrics/source/AbstractSource.scala:46,
 * NamedHistogram; prometheus export) but alerting on distribution
 * movement is left external — here the watchdog runs INSIDE the engine
 * as a streaming query with exact replayability. */
object StreamDrift {

  private val B = 256
  private val Split = "2024-01-16" // baseline = days before, watch = after

  /** Two-sided clamped bin of x under a broadcast (lo, hi) grid —
    * unlike the self-ranged q153 binning, streamed values may fall
    * outside the fitted range. */
  private def clampedBin: Column =
    when(col("hi") === col("lo"), lit(0))
      .otherwise(greatest(least(floor((col("x") - col("lo")) /
        ((col("hi") - col("lo")) / lit(B.toDouble))), lit((B - 1).toDouble)),
        lit(0.0)).cast("int"))

  private def clampedBinSql(x: String): String =
    s"""CASE WHEN hi = lo THEN 0
       |  ELSE CAST(GREATEST(LEAST(FLOOR(($x - lo) / ((hi - lo) / ${B}.0)), ${B - 1}.0), 0.0) AS INTEGER)
       |  END""".stripMargin.replaceAll("\n\\s*", " ")

  /** Typed histogram-vector aggregate: bin index → 256 counts. */
  private object HistVec extends Aggregator[Int, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(B)(0L)
    override def reduce(b: Array[Long], bin: Int): Array[Long] = { b(bin) += 1L; b }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0; while (i < B) { x(i) += y(i); i += 1 }; x
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }
  private val histVec = udaf(HistVec, Encoders.scalaInt)

  /** PUBLIC API — fit the baseline from a static (g, x) frame: one
    * row per group with the grid and the DENSE 256-slot rate array. */
  def fitBaseline(base: DataFrame): DataFrame = {
    val rng = base.groupBy(col("g"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
        count(lit(1)).as("nb"))
    base.join(broadcast(rng), Seq("g"))
      .withColumn("bin", clampedBin)
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("g"))
      // struct-paired entries: two independent collect_lists would not
      // guarantee aligned orders
      .agg(map_from_entries(collect_list(struct(col("bin"), col("cnt"))))
        .as("m"))
      .join(broadcast(rng), Seq("g"))
      .withColumn("qcounts", transform(sequence(lit(0), lit(B - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L))))
      .select(col("g"), col("lo"), col("hi"), col("nb"), col("qcounts"))
      .localCheckpoint()
  }

  /** The shared exact-integer TVD fold over (counts, n, qcounts, nb):
    * Σ|cnt_i·nb − bcnt_i·n| is exact in longs; one double division at
    * the end, identical on both engines. */
  private def tvdCol: Column =
    round(lit(0.5) * aggregate(
      zip_with(col("counts"), col("qcounts"), (c, q) =>
        abs(c * col("nb") - q * col("n"))),
      lit(0L), (acc, x) => acc + x).cast("double") /
      (col("n").cast("double") * col("nb").cast("double")), 6)

  /** PUBLIC API — the streaming watchdog: watermarked event-time
    * tumbling windows over a (g, ts, x) stream, each closed window
    * emitting (window_start, g, n, tvd-vs-baseline).
    *
    * Requires a UTC session timezone: `window(ts, windowLen)` buckets
    * are epoch/UTC-aligned while the q158 batch twin (and any
    * `to_date`-bucketed consumer) uses session-timezone days, so the
    * documented stream-equals-batch guarantee only holds when the two
    * bucketing rules coincide — i.e. when `spark.sql.session.timeZone`
    * resolves to offset zero. Every graft entry point pins UTC; this
    * guard catches a library user who does not. */
  def watch(events: DataFrame, baseline: DataFrame,
      windowLen: String = "1 day", watermark: String = "1 day"): DataFrame = {
    val tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    require(java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC,
      s"StreamDrift.watch requires spark.sql.session.timeZone=UTC (got $tz): " +
        "window() buckets are UTC-aligned but batch-twin day bucketing " +
        "follows the session timezone, so non-UTC sessions break the " +
        "stream-equals-batch guarantee")
    events.withWatermark("ts", watermark)
      .join(broadcast(baseline.select(col("g"), col("lo"), col("hi"))), Seq("g"))
      .withColumn("bin", clampedBin)
      .groupBy(window(col("ts"), windowLen), col("g"))
      .agg(histVec(col("bin")).as("counts"), count(lit(1)).as("n"))
      .join(broadcast(baseline.select(col("g"), col("qcounts"), col("nb"))),
        Seq("g"))
      .withColumn("tvd", tvdCol)
      .select(col("window.start").as("window_start"), col("g"), col("n"),
        col("tvd"))
  }

  /** Q158: the batch twin — baseline fitted on the first fixture
    * fortnight, every later day TVD'd against it through the SAME
    * histogram aggregate and integer TVD fold as the streaming leg
    * (StreamingSpec proves stream ≡ batch row-for-row). */
  private def q158(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type").as("g"), col("ts"), col("value").as("x"))
    val baseline = fitBaseline(
      ev.where(to_date(col("ts")) < lit(Split).cast("date"))
        .select(col("g"), col("x")))
    ev.where(to_date(col("ts")) >= lit(Split).cast("date"))
      .join(broadcast(baseline.select(col("g"), col("lo"), col("hi"))), Seq("g"))
      .withColumn("bin", clampedBin)
      .groupBy(to_date(col("ts")).as("day"), col("g"))
      .agg(histVec(col("bin")).as("counts"), count(lit(1)).as("n"))
      .join(broadcast(baseline.select(col("g"), col("qcounts"), col("nb"))),
        Seq("g"))
      .withColumn("tvd", tvdCol)
      .select(col("g"), col("day"), col("n"), col("tvd"))
      .orderBy(col("g").asc_nulls_last, col("day").asc_nulls_last)
  }

  private val q158Sql = {
    val binB = clampedBinSql("b.x")
    val binW = clampedBinSql("w.x")
    s"""WITH ev AS (
       |  SELECT event_type AS g, CAST(ts AS DATE) AS day, value AS x FROM events),
       |bl AS (SELECT g, x FROM ev WHERE day < DATE '$Split'),
       |rng AS (SELECT g, MIN(x) AS lo, MAX(x) AS hi, COUNT(*) AS nb
       |  FROM bl GROUP BY g),
       |qr AS (
       |  SELECT b.g, $binB AS bin, COUNT(*) AS qcnt
       |  FROM bl b JOIN rng USING (g) GROUP BY 1, 2),
       |wh AS (
       |  SELECT w.g, w.day, $binW AS bin, COUNT(*) AS cnt
       |  FROM ev w JOIN rng USING (g) WHERE w.day >= DATE '$Split'
       |  GROUP BY 1, 2, 3),
       |wn AS (SELECT g, day, SUM(cnt) AS n FROM wh GROUP BY 1, 2),
       |contrib AS (
       |  SELECT g, day, bin, SUM(c) AS c, SUM(q) AS q FROM (
       |    SELECT h.g, h.day, h.bin, h.cnt AS c, CAST(0 AS BIGINT) AS q
       |    FROM wh h
       |    UNION ALL
       |    SELECT d.g, d.day, qr.bin, CAST(0 AS BIGINT) AS c, qr.qcnt AS q
       |    FROM qr JOIN (SELECT DISTINCT g, day FROM wn) d USING (g)) u
       |  GROUP BY 1, 2, 3)
       |SELECT c.g, c.day, CAST(MIN(w.n) AS BIGINT) AS n,
       |  ROUND(0.5::DOUBLE * CAST(SUM(ABS(c.c * r.nb - c.q * w.n)) AS DOUBLE)
       |    / (CAST(MIN(w.n) AS DOUBLE) * CAST(MIN(r.nb) AS DOUBLE)), 6) AS tvd
       |FROM contrib c
       |  JOIN wn w ON c.g = w.g AND c.day = w.day
       |  JOIN rng r ON r.g = c.g
       |GROUP BY c.g, c.day
       |ORDER BY c.g ASC NULLS LAST, c.day ASC NULLS LAST""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q158_stream_drift", q158, Some(q158Sql)))
}
