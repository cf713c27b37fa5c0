package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12: seasonally-adjusted anomaly days — which days broke the
  * WEEKLY pattern. A raw daily-volume alarm pages every Sunday if
  * Sundays run 40% low; the right baseline for a day is its own
  * day-of-week mean (q173's decomposition), and the anomaly score is
  * the relative deviation from THAT. Per group, the top-k days by
  * |x − mean_dow| / mean_dow with deterministic ties (score desc, day
  * asc) — the "what happened on the 17th" triage list.
  *
  * Exactness trick: the score is computed as |x·n_d − s_d| / s_d over
  * the PURE-INTEGER day-of-week totals (algebraically identical to
  * |x − mean|/mean but with no intermediate rounding) — numerator and
  * denominator scale exactly together under replication, so the score
  * is BIT-equal at ×10 and DuckDB replays it from the same integers.
  * Zero-mass (s_d = 0) buckets are excluded (relative deviation from
  * an all-zero baseline is undefined); `expected` (the dow mean) is a
  * display column rounded to 6 dp.
  *
  * Scale: one fact-sized map-combined daily count; the dow totals and
  * the rank run on the (group, day) frame — calendar-bounded, the
  * q169/q171 contract. Top-k per group is a WindowGroupLimit-eligible
  * row_number filter.
  *
  * Reference anchor: celeborn pages on absolute gauge thresholds
  * (common/.../metrics); seasonal baselining is what separates "Sunday
  * again" from an incident.
  */
object SeasonalAnomaly {

  /** PUBLIC API — top-k seasonally-adjusted anomaly days over a
    * (g, day, x: long) daily series. */
  def anomalousDays(daily: DataFrame, topK: Int = 3): DataFrame = {
    val dd = datediff(col("day"), lit(java.sql.Date.valueOf("1995-01-01")))
      .cast("long")
    val s = daily
      .select(col("g"), col("day"), pmod(dd, lit(7L)).as("dow"), col("x"))
      .localCheckpoint()
    val byDow = s.groupBy(col("g"), col("dow"))
      .agg(count(lit(1)).as("n_d"), sum(col("x")).as("s_d"))
    val scored = s.join(byDow, Seq("g", "dow"))
      .where(col("s_d") > 0)
      .select(col("g"), col("day"), col("dow"), col("x"),
        round(col("s_d").cast("double") / col("n_d"), 6).as("expected"),
        (abs(col("x") * col("n_d") - col("s_d")).cast("double")
          / col("s_d")).as("rel_dev"))
    val wTop = Window.partitionBy(col("g"))
      .orderBy(col("rel_dev").desc, col("day").asc)
    scored.withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= topK)
      .select(col("g"), col("rk").cast("long").as("rk"), col("day"),
        col("dow"), col("x"), col("expected"),
        round(col("rel_dev"), 9).as("rel_dev"))
      .orderBy(col("g").asc_nulls_last, col("rk").asc_nulls_last)
  }

  /** Q180: the 3 most weekly-pattern-breaking days per event type. */
  private def q180(s: SparkSession, dir: String): DataFrame =
    anomalousDays(Tables.t(s, dir, "events")
      .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))

  private val q180Sql: String =
    """WITH daily AS (
      |  SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT g, day,
      |    CAST(((date_diff('day', DATE '1995-01-01', day) % 7) + 7) % 7
      |      AS BIGINT) AS dow, x
      |  FROM daily),
      |bydow AS (
      |  SELECT g, dow, CAST(COUNT(*) AS BIGINT) AS n_d,
      |    CAST(SUM(x) AS BIGINT) AS s_d
      |  FROM s GROUP BY 1, 2),
      |scored AS (
      |  SELECT s.g, s.day, s.dow, s.x,
      |    ROUND(CAST(b.s_d AS DOUBLE) / b.n_d, 6) AS expected,
      |    CAST(ABS(s.x * b.n_d - b.s_d) AS DOUBLE) / b.s_d AS rel_dev
      |  FROM s JOIN bydow b ON s.g = b.g AND s.dow = b.dow
      |  WHERE b.s_d > 0),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY g
      |      ORDER BY rel_dev DESC, day ASC) AS rk
      |  FROM scored)
      |SELECT g, CAST(rk AS BIGINT) AS rk, day, dow, x, expected,
      |  ROUND(rel_dev, 9) AS rel_dev
      |FROM ranked WHERE rk <= 3
      |ORDER BY g ASC NULLS LAST, rk ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q180_seasonal_anomaly", q180, Some(q180Sql)))
}
