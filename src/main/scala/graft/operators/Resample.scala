package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8: time-series resampling with forward fill — turn an
  * irregular event stream into a dense fixed-interval grid (the
  * feature-store / monitoring shape: "hourly metric per type, carrying
  * the last observation through gaps"). Composes the q38 as-of idea
  * with grid generation.
  *
  * Plan shape: hourly pre-aggregation first (map-side combined, the
  * only pass over the raw events), then the per-type grid via
  * `sequence()` + explode (grid size = hours × types, bounded by the
  * TIME RANGE, not the corpus — 10× more events is the same grid), a
  * grid⋈buckets join on (type, hour), and the forward fill as ONE
  * window pass.
  *
  * The fill is the COUNT-group trick instead of
  * `last_value IGNORE NULLS`: cumulative COUNT(x) increments exactly at
  * non-null rows, so rows sharing a count value form one fill group
  * whose single non-null (its first row) is the carried observation —
  * plain COUNT/MAX windows that both engines implement identically. */
object Resample {

  /** PUBLIC API — resample (ts, value) events per `keyCol` onto an
    * `interval` grid with forward fill; avg per bucket, 6-dp decimal
    * discipline. */
  def resampleFfill(events: DataFrame, keyCol: String): DataFrame = {
    val hourly = events
      .select(col(keyCol).as("k"), date_trunc("hour", col("ts")).as("h"),
        col("value").cast("decimal(28,6)").as("v"))
      .groupBy(col("k"), col("h"))
      .agg(round(sum(col("v")).cast("double") / count(lit(1)), 6).as("bucket_avg"))
    val grid = hourly.groupBy(col("k"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("k"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("h"))
    val wFill = Window.partitionBy(col("k"))
      .orderBy(col("h").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grp = count(col("bucket_avg")).over(wFill)
    val joined = grid.join(hourly, Seq("k", "h"), "left_outer")
      .withColumn("fill_grp", grp)
    joined
      .withColumn("filled", max(col("bucket_avg"))
        .over(Window.partitionBy(col("k"), col("fill_grp"))))
      .select(col("k"), col("h"), col("filled").as("value"),
        col("bucket_avg").isNull.as("was_gap"))
      .orderBy(col("k").asc_nulls_last, col("h").asc_nulls_last)
  }

  /** Q130: hourly event value per event_type, gaps forward-filled. */
  private def q130(s: SparkSession, dir: String): DataFrame =
    resampleFfill(Tables.t(s, dir, "events"), "event_type")

  private val q130Sql =
    """WITH hourly AS (
      |  SELECT event_type AS k, date_trunc('hour', ts) AS h,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
      |      / COUNT(*), 6) AS bucket_avg
      |  FROM events GROUP BY 1, 2),
      |rng AS (SELECT k, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY k),
      |grid AS (
      |  SELECT k, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM rng),
      |joined AS (
      |  SELECT g.k, g.h, hourly.bucket_avg,
      |    COUNT(hourly.bucket_avg) OVER (PARTITION BY g.k ORDER BY g.h ASC
      |      ROWS UNBOUNDED PRECEDING) AS fill_grp
      |  FROM grid g LEFT OUTER JOIN hourly ON g.k = hourly.k AND g.h = hourly.h)
      |SELECT k, h,
      |  MAX(bucket_avg) OVER (PARTITION BY k, fill_grp) AS value,
      |  bucket_avg IS NULL AS was_gap
      |FROM joined
      |ORDER BY k ASC NULLS LAST, h ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q130_resample_ffill", q130, Some(q130Sql)))
}
