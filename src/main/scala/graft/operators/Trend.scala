package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12: robust trend telemetry — the Mann–Kendall test plus the
  * Theil–Sen slope per group over a daily series. This completes the
  * time-axis family: q167 (ACF) reads a series' memory, q169 (CUSUM)
  * locates a level shift; q171 answers "is it trending, which way,
  * how fast, and how sure" — robustly. q147's OLS slope is the
  * parametric answer, but one bad ingest day drags a least-squares
  * fit arbitrarily; the Mann–Kendall statistic S = Σ_{i<j}
  * sign(x_j − x_i) (Mann 1945, Kendall 1975) and the Theil–Sen slope
  * (the MEDIAN of all pairwise slopes; Theil 1950, Sen 1968, ~29%
  * breakdown point) both shrug it off — TrendSpec plants the outlier
  * and proves the contrast against the exact OLS fit.
  *
  * Oracle parity: S and the tie-corrected variance numerator
  * n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) are PURE BIGINT; each pairwise
  * slope is one integer-over-integer double division; the median is
  * picked by rank (avg of the two middle order statistics), and the
  * z-score is a continuity-corrected division by one √ — correctly
  * rounded IEEE in both engines (the q164 discipline). No
  * order-sensitive double accumulation anywhere.
  *
  * Scale: the only fact-sized stage is the map-combined daily count;
  * the pairwise stage is a self-join of the CHECKPOINTED (group, day)
  * frame — #days is calendar-bounded (≤ ~3.7k/decade), so pairs are
  * ≤ days²/2 per group, millions of tiny rows at worst, partitioned
  * by group. The checkpoint keeps the four consumers (pairs ×2, day
  * counts, tie counts) from re-deriving the fact aggregation.
  *
  * Reference anchor: celeborn's master tracks per-worker slot/disk
  * load deltas for imbalance decisions (WorkerStatusTracker) but has
  * no trend primitive; capacity planning on such telemetry is exactly
  * a Mann–Kendall question ("is disk usage trending up, robustly?").
  */
object Trend {

  /** PUBLIC API — Mann–Kendall + Theil–Sen over a (g, day, x: long)
    * daily series: per group the test statistic S, tie-corrected
    * variance, continuity-corrected z, and the Theil–Sen slope in
    * x-units per day. Single-day groups emit nothing (no pairs); an
    * all-tied (constant) group has var_s = 0 and z = NULL. */
  def mannKendall(daily: DataFrame): DataFrame = {
    val s = daily.select(col("g"), col("day"), col("x")).localCheckpoint()
    val pairs = s
      .join(s.select(col("g"), col("day").as("day2"), col("x").as("x2")),
        Seq("g"))
      .where(col("day") < col("day2"))
      .select(col("g"),
        when(col("x2") > col("x"), 1L).when(col("x2") < col("x"), -1L)
          .otherwise(0L).as("sgn"),
        ((col("x2") - col("x")).cast("double") /
          datediff(col("day2"), col("day"))).as("slope"))
    val sAgg = pairs.groupBy(col("g"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("sgn")).as("s_stat"))
    val nDays = s.groupBy(col("g")).agg(count(lit(1)).as("n_days"))
    val ties = s.groupBy(col("g"), col("x")).agg(count(lit(1)).as("t"))
      .groupBy(col("g"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
        .as("tie_term"))
    // exact median of the pairwise slopes: rank once, keep the middle
    // order statistic(s) — (np+1)/2 and np/2+1 coincide when np is odd
    val wMed = Window.partitionBy(col("g"))
      .orderBy(col("slope").asc_nulls_last)
    val sen = pairs
      .withColumn("rk", row_number().over(wMed))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(col("g"))))
      // Column./ is double division in Spark — floor() recovers the
      // integer order-statistic ranks the DuckDB // mirror computes
      .where(col("rk") === floor((col("np") + 1) / 2) ||
        col("rk") === floor(col("np") / 2) + 1)
      .groupBy(col("g")).agg(avg(col("slope")).as("sen_slope"))
    sAgg.join(nDays, "g").join(ties, "g").join(sen, "g")
      .withColumn("var_s",
        (col("n_days") * (col("n_days") - 1) *
          (lit(2L) * col("n_days") + 5) - col("tie_term"))
          .cast("double") / 18.0)
      .select(col("g"), col("n_days"), col("n_pairs"), col("s_stat"),
        round(col("var_s"), 6).as("var_s"),
        when(col("var_s") > 0,
          round((col("s_stat") -
            when(col("s_stat") > 0, 1L).when(col("s_stat") < 0, -1L)
              .otherwise(0L)).cast("double") / sqrt(col("var_s")), 6))
          .as("z"),
        round(col("sen_slope"), 9).as("sen_slope"))
      .orderBy(col("g").asc_nulls_last)
  }

  /** Q171: robust trend of each event type's daily volume series. */
  private def q171(s: SparkSession, dir: String): DataFrame =
    mannKendall(Tables.t(s, dir, "events")
      .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))

  private val q171Sql: String =
    """WITH s AS (
      |  SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.g,
      |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn,
      |    CAST(b.x - a.x AS DOUBLE) / date_diff('day', a.day, b.day) AS slope
      |  FROM s a JOIN s b ON a.g = b.g AND a.day < b.day),
      |sagg AS (
      |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(sgn) AS BIGINT) AS s_stat
      |  FROM pairs GROUP BY g),
      |nd AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_days FROM s GROUP BY g),
      |ties AS (
      |  SELECT g, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT g, x, COUNT(*) AS t FROM s GROUP BY g, x) GROUP BY g),
      |ranked AS (
      |  SELECT g, slope,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY slope ASC NULLS LAST)
      |      AS rk,
      |    COUNT(*) OVER (PARTITION BY g) AS np
      |  FROM pairs),
      |sen AS (
      |  SELECT g, AVG(slope) AS sen_slope FROM ranked
      |  WHERE rk = (np + 1) // 2 OR rk = np // 2 + 1 GROUP BY g),
      |fin AS (
      |  SELECT sagg.g, n_days, n_pairs, s_stat,
      |    CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
      |      AS DOUBLE) / 18.0 AS var_s,
      |    sen_slope
      |  FROM sagg JOIN nd USING (g) JOIN ties USING (g) JOIN sen USING (g))
      |SELECT g, n_days, n_pairs, s_stat, ROUND(var_s, 6) AS var_s,
      |  CASE WHEN var_s > 0 THEN
      |    ROUND(CAST(s_stat - (CASE WHEN s_stat > 0 THEN 1
      |      WHEN s_stat < 0 THEN -1 ELSE 0 END) AS DOUBLE)
      |      / SQRT(var_s), 6) END AS z,
      |  ROUND(sen_slope, 9) AS sen_slope
      |FROM fin ORDER BY g ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q171_trend", q171, Some(q171Sql)))
}
