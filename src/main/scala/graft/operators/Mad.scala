package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9: robust outlier detection by MEDIAN ABSOLUTE DEVIATION —
  * the estimator profilers reach for when mean/stddev are themselves
  * corrupted by the outliers being hunted (50% breakdown point vs 0%
  * for z-scores). A row is flagged when |x − median| > 3 · 1.4826 ·
  * MAD (1.4826 = 1/Φ⁻¹(3/4) makes MAD a consistent σ estimator under
  * normality, so "3σ" keeps its usual reading).
  *
  * Spark-first shape (the q123/q124 sketch discipline): BOTH medians
  * come from the mergeable fixed-bin histogram — pass 1 sketches x per
  * group (median), pass 2 sketches the derived |x − med| column
  * (MAD), pass 3 counts exceedances map-side. Three scans, two
  * bins-sized keyed aggregates, zero per-group sorts — at 100 TB no
  * stage's parallelism depends on |groups|, where the textbook
  * two-nested-medians query is two full-corpus rank windows.
  *
  * Determinism/oracle: bin rules, interpolation, and the threshold
  * comparison are the same integer-count + double expression trees on
  * both engines (the [[RobustStats]] parity argument), so DuckDB
  * replays the flag counts exactly — the sketch medians are
  * reproduced, not approximated, by the oracle. */
object Mad {

  private val K = 1.4826
  private val Z = 3.0

  /** PUBLIC API — per-group robust outlier profile of a (g, x) frame:
    * sketch median, sketch MAD, and the count beyond z·K·MAD. */
  def madOutliers(s: SparkSession, base: DataFrame, z: Double = Z): DataFrame = {
    val med = RobustStats.sketchQuantiles(s, RobustStats.cumHist(base), Seq(0.5))
      .select(col("g"), col("q_est").as("med"))
    val dev = base.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("x") - col("med")).as("x"))
    val mad = RobustStats.sketchQuantiles(s, RobustStats.cumHist(dev), Seq(0.5))
      .select(col("g"), col("q_est").as("mad"))
    base.join(broadcast(med), Seq("g")).join(broadcast(mad), Seq("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("x") - col("med")) > lit(z * K) * col("mad"), 1L)
          .otherwise(0L)).cast("long").as("n_outliers"),
        round(min(col("med")), 6).as("med"),
        round(min(col("mad")), 6).as("mad"))
      .orderBy(col("g").asc_nulls_last)
  }

  /** Q150: MAD outlier profile of l_extendedprice per return flag. */
  private def q150(s: SparkSession, dir: String): DataFrame =
    madOutliers(s, Tables.t(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x")))

  private val q150Sql = {
    val pass1 = RobustStats.cumHistSqlFor("",
      "SELECT l_returnflag AS g, l_extendedprice AS x FROM lineitem")
    val pass2 = RobustStats.cumHistSqlFor("d_",
      "SELECT b.g, ABS(b.x - m.med) AS x FROM base b JOIN med m USING (g)")
    s"""WITH $pass1,
       |${RobustStats.sketchQuantilesSqlFor("", Seq(0.5))},
       |med AS (SELECT g, q_est AS med FROM qhit),
       |$pass2,
       |${RobustStats.sketchQuantilesSqlFor("d_", Seq(0.5))},
       |mad AS (SELECT g, q_est AS mad FROM d_qhit)
       |SELECT b.g, COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN ABS(b.x - m.med) > ${Z * K} * d.mad
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |  ROUND(MIN(m.med), 6) AS med, ROUND(MIN(d.mad), 6) AS mad
       |FROM base b JOIN med m USING (g) JOIN mad d USING (g)
       |GROUP BY b.g
       |ORDER BY g ASC NULLS LAST""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q150_mad_outliers", q150, Some(q150Sql)))
}
