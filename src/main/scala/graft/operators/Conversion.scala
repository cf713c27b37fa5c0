package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8: conversion-lag analysis — the time-to-convert complement
  * of q68's step-count funnel: for each user, the latency from FIRST
  * signup to the FIRST purchase at or after it, with the conversion
  * rate and exact latency percentiles.
  *
  * Shape: two user-keyed min-aggregates (signup side pre-filtered, the
  * purchase side min is CONDITIONAL on following the signup — a keyed
  * join + min, never a per-user sort), then one global percentile fold
  * over integer-microsecond latencies (exact in double below 2⁵³;
  * interpolation at .5/.9 is the q39 cross-engine discipline). */
object Conversion {

  /** Q144: signup→purchase conversion rate + latency percentiles. */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    val signup = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val converted = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
      .join(signup, Seq("user_id"))
      .where(col("p_ts") >= col("s_ts"))
      .groupBy(col("user_id"), col("s_ts"))
      .agg(min(col("p_ts")).as("p_first"))
      .select(col("user_id"),
        (unix_micros(col("p_first")) - unix_micros(col("s_ts")))
          .cast("double").as("lat_us"))
    signup.agg(count(lit(1)).as("n_signup"))
      .crossJoin(broadcast(converted.agg(
        count(lit(1)).as("n_converted"),
        expr("percentile(lat_us, 0.5)").as("p50_us"),
        expr("percentile(lat_us, 0.9)").as("p90_us"))))
      .select(col("n_signup"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_signup"), 6)
          .as("conv_rate"),
        col("p50_us"), col("p90_us"))
  }

  private val q144Sql =
    """WITH signup AS (
      |  SELECT user_id, MIN(ts) AS s_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |conv AS (
      |  SELECT e.user_id,
      |    CAST(epoch_us(MIN(e.ts)) - epoch_us(s.s_ts) AS DOUBLE) AS lat_us
      |  FROM events e JOIN signup s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
      |  GROUP BY e.user_id, s.s_ts),
      |a AS (SELECT COUNT(*) AS n_signup FROM signup),
      |b AS (SELECT COUNT(*) AS n_converted,
      |  quantile_cont(lat_us, 0.5) AS p50_us,
      |  quantile_cont(lat_us, 0.9) AS p90_us FROM conv)
      |SELECT n_signup, n_converted,
      |  ROUND(CAST(n_converted AS DOUBLE) / n_signup, 6) AS conv_rate,
      |  p50_us, p90_us
      |FROM a CROSS JOIN b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q144_conversion_lag", q144, Some(q144Sql)))
}
