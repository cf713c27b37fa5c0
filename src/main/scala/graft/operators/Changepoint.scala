package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12: CUSUM changepoint detection — the drift family's missing
  * "WHEN did it move" answer. q153/q154 say whether two periods
  * diverge, q156 plots month-over-month divergence, q157 tests two
  * samples; this locates the single most likely level-shift day in
  * each group's daily series via the classic cumulative-sum statistic
  * (Page 1954): the day d maximizing |Σ_{i≤d}(x_i − μ)| — for a
  * step-mean series the CUSUM peaks exactly at the step boundary.
  *
  * Exact-arithmetic trick (the oracle-parity discipline): the naive
  * statistic S_d = Σ(x_i − μ) needs the double μ = total/n inside a
  * running sum — order-sensitive floating addition. Scaling by n
  * clears the fraction: T_d = n·S_d = n·cum_d − d·total is PURE
  * BIGINT (counts and their prefix sums), so the argmax, tie-breaks
  * and ×k replication laws are exact; the three doubles in the output
  * (s_max = |T|/n, the segment means) are single divisions off exact
  * integers, DuckDB-replayable bit-for-bit.
  *
  * Scale: all window work runs on the aggregated (group, day) frame —
  * #groups × #days rows regardless of fact size; the only fact-sized
  * stage is the map-combined daily count. Day d = n is excluded as a
  * candidate (T_n ≡ 0 and the after-segment is empty); single-day
  * groups therefore emit nothing, by contract.
  *
  * Reference anchor: celeborn tracks per-worker load time series for
  * imbalance diagnosis (master/.../WorkerStatusTracker) but leaves
  * "when did the level shift" to the operator's eyeball; here it is a
  * first-class query.
  */
object Changepoint {

  /** PUBLIC API — CUSUM over a (g, day, x: long) daily series: per
    * group, the argmax-|T| day with the exact scaled statistic and the
    * before/after segment means. */
  def cusum(daily: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("g").orderBy("day")
    val wAll = Window.partitionBy("g")
    val t = daily
      .withColumn("d", row_number().over(wOrd))
      .withColumn("cum", sum(col("x")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("x")).over(wAll))
      .where(col("d") < col("n"))
      .withColumn("t_stat", col("n") * col("cum") - col("d") * col("total"))
    val pick = Window.partitionBy("g")
      .orderBy(abs(col("t_stat")).desc, col("day").asc)
    t.withColumn("rk", row_number().over(pick))
      .where(col("rk") === 1)
      .select(col("g"), col("day").as("cp_day"),
        abs(col("t_stat")).as("t_max"),
        round(abs(col("t_stat")).cast("double") / col("n"), 6).as("s_max"),
        round(col("cum").cast("double") / col("d"), 6).as("mean_before"),
        round((col("total") - col("cum")).cast("double")
          / (col("n") - col("d")), 6).as("mean_after"))
      .orderBy(col("g").asc_nulls_last)
  }

  /** Q169: the changepoint of each event type's daily volume series. */
  private def q169(s: SparkSession, dir: String): DataFrame =
    cusum(Tables.t(s, dir, "events")
      .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))

  private val q169Sql: String =
    """WITH daily AS (
      |  SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT g, day, x,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY day) AS d,
      |    CAST(SUM(x) OVER (PARTITION BY g ORDER BY day) AS BIGINT) AS cum,
      |    CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n,
      |    CAST(SUM(x) OVER (PARTITION BY g) AS BIGINT) AS total
      |  FROM daily),
      |s AS (
      |  SELECT g, day, d, cum, n, total,
      |    CAST(n * cum - d * total AS BIGINT) AS t_stat
      |  FROM t WHERE d < n),
      |p AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY g ORDER BY ABS(t_stat) DESC, day ASC) AS rk
      |  FROM s)
      |SELECT g, day AS cp_day, CAST(ABS(t_stat) AS BIGINT) AS t_max,
      |  ROUND(CAST(ABS(t_stat) AS DOUBLE) / n, 6) AS s_max,
      |  ROUND(CAST(cum AS DOUBLE) / d, 6) AS mean_before,
      |  ROUND(CAST(total - cum AS DOUBLE) / (n - d), 6) AS mean_after
      |FROM p WHERE rk = 1
      |ORDER BY g ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q169_changepoint", q169, Some(q169Sql)))
}
