package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8: experiment analytics over the event log.
  *
  * q136 — CUPED variance reduction (Deng et al., WSDM 2013): adjust the
  * post-period metric with the pre-period covariate,
  * ŷ = y − θ(x − x̄), θ = cov(x,y)/var(x), cutting A/B variance without
  * biasing the delta. Every moment (n, Σx, Σy, Σxy, Σx²) accumulates in
  * exact DECIMAL from per-user decimal sums; θ and the adjusted means
  * derive from those sums by one shared double expression tree — the
  * oracle reproduces them to the 9-dp round.
  *
  * q137 — last-touch attribution: credit each purchase to a preceding
  * click within the hour, per user, via ONE user-keyed window carrying
  * the latest click timestamp (running max) — the attribution variant
  * of q38's as-of join that needs no join at all. Tie-safe: ordering
  * breaks on event_id.
  *
  * Both are one-scan shapes: user-keyed aggregation/window plus
  * constant-size reductions — nothing scales with anything but the
  * event count. */
object Experiment {

  private def dec(c: Column) = c.cast("decimal(28,6)")

  /** Q136: CUPED-adjusted per-arm means (arm = user_id % 2; pre = first
    * half of the window, post = second half). */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val perUser = Tables.t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < cut, dec(col("value")))
          .otherwise(dec(lit(0)))).as("xd"),
        sum(when(col("ts") >= cut, dec(col("value")))
          .otherwise(dec(lit(0)))).as("yd"))
      .select(col("user_id"), (col("user_id") % 2).cast("int").as("arm"),
        col("xd").cast("double").as("x"), col("yd").cast("double").as("y"))
      .localCheckpoint()
    val g = perUser.agg(
      count(lit(1)).cast("double").as("n"),
      sum(dec(col("x"))).cast("double").as("sx"),
      sum(dec(col("y"))).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,12)")).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,12)")).cast("double").as("sxx"))
    val arms = perUser.groupBy(col("arm")).agg(
      count(lit(1)).cast("double").as("na"),
      sum(dec(col("x"))).cast("double").as("sxa"),
      sum(dec(col("y"))).cast("double").as("sya"))
    val theta = (col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))) /
      (col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")))
    arms.crossJoin(broadcast(g))
      .select(col("arm"), col("na").cast("long").as("n_users"),
        round(col("sya") / col("na"), 9).as("y_mean"),
        round(col("sya") / col("na") -
          theta * (col("sxa") / col("na") - col("sx") / col("n")), 9).as("y_adj"),
        round(theta, 9).as("theta"))
      .orderBy(col("arm").asc_nulls_last)
  }

  private val q136Sql =
    """WITH pu AS (
      |  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
      |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |      THEN CAST(value AS DECIMAL(28,6))
      |      ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS x,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |      THEN CAST(value AS DECIMAL(28,6))
      |      ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS y
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
      |  FROM pu),
      |arms AS (
      |  SELECT arm, CAST(COUNT(*) AS DOUBLE) AS na,
      |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sxa,
      |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sya
      |  FROM pu GROUP BY arm)
      |SELECT arm, CAST(na AS BIGINT) AS n_users,
      |  ROUND(sya / na, 9) AS y_mean,
      |  ROUND(sya / na -
      |    ((sxy / n - (sx / n) * (sy / n)) / (sxx / n - (sx / n) * (sx / n)))
      |    * (sxa / na - sx / n), 9) AS y_adj,
      |  ROUND((sxy / n - (sx / n) * (sy / n))
      |    / (sxx / n - (sx / n) * (sx / n)), 9) AS theta
      |FROM arms CROSS JOIN g
      |ORDER BY arm ASC NULLS LAST""".stripMargin

  /** Q137: last-touch (click-within-1h) purchase attribution. */
  private def q137(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.t(s, dir, "events")
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .where(col("event_type") === "purchase")
      .withColumn("bucket",
        when(col("last_click").isNotNull &&
          col("last_click") >= col("ts") - expr("INTERVAL 1 HOUR"), "click_1h")
          .otherwise("organic"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(dec(col("value"))).cast("double").as("attributed_value"))
      .orderBy(col("bucket").asc_nulls_last)
  }

  private val q137Sql =
    """WITH tagged AS (
      |  SELECT event_type, ts, value,
      |    MAX(CASE WHEN event_type = 'click' THEN ts END)
      |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |            ROWS UNBOUNDED PRECEDING) AS last_click
      |  FROM events)
      |SELECT CASE WHEN last_click IS NOT NULL
      |         AND last_click >= ts - INTERVAL 1 HOUR
      |       THEN 'click_1h' ELSE 'organic' END AS bucket,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS attributed_value
      |FROM tagged WHERE event_type = 'purchase'
      |GROUP BY 1
      |ORDER BY bucket ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q136_cuped", q136, Some(q136Sql)),
    QueryDef("q137_attribution", q137, Some(q137Sql)))
}
