package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12: rolling trend series — the trailing-window least-squares
  * slope per (group, day). q171 renders ONE robust verdict per group
  * ("trending up, p<.05"); operations wants the series: WHEN did the
  * trend turn, which is a per-day slope over a trailing calendar
  * window. Least squares is the right tool HERE (unlike q171's global
  * fit): a 7-day window self-localizes, so the outlier-resistance
  * argument moves to the window length, and the closed form
  *   b = (n·Σdx − Σd·Σx) / (n·Σd² − (Σd)²)
  * over integer day-index/count sums is ONE window pass — no pair
  * explosion per emitted row.
  *
  * Oracle parity: the window frame is RANGE over the integer day
  * index (calendar days, so gaps shrink n rather than silently
  * stretching the window), every Σ is an exact BIGINT window sum, and
  * the slope is a single integer-over-integer double division — DuckDB
  * replays bit-for-bit. Days with n < 2 in the window emit NULL (a
  * one-point fit is undefined, the q164 degenerate-side contract).
  *
  * Scale: one fact-sized map-combined daily count, then ONE window
  * pass over the (group, day) frame — #groups × #days rows, calendar-
  * bounded; the per-group serial window is the q166 block-total
  * contract. No self-join: rolling sums make each emitted row O(1).
  *
  * Reference anchor: celeborn's `WorkerStatusTracker` smooths load by
  * fixed exponential decay; a windowed slope is the statistic an
  * operator actually pages on ("disk fill-rate over the last week").
  */
object RollingTrend {

  /** PUBLIC API — trailing-window OLS slope over a (g, day, x: long)
    * daily series: per (g, day), the fit over the last `windowDays`
    * calendar days (inclusive). */
  def rollingSlope(daily: DataFrame, windowDays: Int = 7): DataFrame = {
    val dd = datediff(col("day"), lit(java.sql.Date.valueOf("1995-01-01")))
      .cast("long")
    val w = Window.partitionBy(col("g")).orderBy(col("dd"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily
      .select(col("g"), col("day"), dd.as("dd"), col("x"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sd", sum(col("dd")).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sdd", sum(col("dd") * col("dd")).over(w))
      .withColumn("sdx", sum(col("dd") * col("x")).over(w))
      .select(col("g"), col("day"), col("n").as("win_n"),
        when(col("n") >= 2,
          round((col("n") * col("sdx") - col("sd") * col("sx"))
            .cast("double") /
            (col("n") * col("sdd") - col("sd") * col("sd")), 9))
          .as("slope"))
      .orderBy(col("g").asc_nulls_last, col("day").asc_nulls_last)
  }

  /** Q172: 7-day rolling trend of each event type's daily volume. */
  private def q172(s: SparkSession, dir: String): DataFrame =
    rollingSlope(Tables.t(s, dir, "events")
      .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))

  private val q172Sql: String =
    """WITH daily AS (
      |  SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |d AS (
      |  SELECT g, day, CAST(date_diff('day', DATE '1995-01-01', day)
      |    AS BIGINT) AS dd, x
      |  FROM daily),
      |wsum AS (
      |  SELECT g, day,
      |    CAST(COUNT(*) OVER win AS BIGINT) AS n,
      |    CAST(SUM(dd) OVER win AS BIGINT) AS sd,
      |    CAST(SUM(x) OVER win AS BIGINT) AS sx,
      |    CAST(SUM(dd * dd) OVER win AS BIGINT) AS sdd,
      |    CAST(SUM(dd * x) OVER win AS BIGINT) AS sdx
      |  FROM d
      |  WINDOW win AS (PARTITION BY g ORDER BY dd
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT g, day, n AS win_n,
      |  CASE WHEN n >= 2 THEN
      |    ROUND(CAST(n * sdx - sd * sx AS DOUBLE)
      |      / (n * sdd - sd * sd), 9) END AS slope
      |FROM wsum
      |ORDER BY g ASC NULLS LAST, day ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q172_rolling_trend", q172, Some(q172Sql)))
}
