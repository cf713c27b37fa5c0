package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12: survival analysis — the Nelson–Aalen cumulative-hazard
  * estimator over right-censored durations. q144 reports the lag
  * percentiles of users who DID convert; that conditions on the
  * outcome and silently drops everyone still waiting. The survival
  * estimator does the accounting correctly: every subject stays in
  * the risk set until their event OR censoring time, so "how fast do
  * signups convert" is answered without survivorship bias — at each
  * event time t, hazard h(t) = d_t / n_t (events over at-risk), and
  * H(t) = Σ_{s≤t} h(s) estimates the cumulative hazard
  * (Nelson 1969, Aalen 1978; S(t) ≈ exp(−H(t))).
  *
  * Oracle parity: d_t and n_t are exact BIGINTs (risk sets from one
  * cumulative count over the distinct-duration frame, never a
  * per-subject sort); each hazard term is one integer division
  * rounded to 12 dp and cast DECIMAL(38,12), so the cumulative sum is
  * exact and order-free — Spark and DuckDB agree bit-for-bit.
  *
  * Scale: the fact-sized stages are two user-keyed aggregations (the
  * q144 shape); everything after runs on the distinct-duration frame
  * (≤ corpus span in days). That tiny frame's cumulative window is
  * the only serial stage, same contract as q166's ≤256-row block
  * totals. Censoring time = corpus max(ts), one broadcast scalar.
  *
  * Plan contract: gwin=3 — all three unpartitioned windows (risk-set
  * cumsum, total-count, cumulative hazard) run over that same
  * distinct-duration frame, bounded by the corpus day span.
  *
  * Reference anchor: celeborn ages out shuffle partitions by fixed
  * TTL (worker/.../storage/StorageManager cleaner); duration-to-event
  * analysis with censoring is the principled generalization an
  * operator needs to SET such TTLs.
  */
object Survival {

  /** PUBLIC API — Nelson–Aalen over one row per subject
    * (dur: long, observed: 0/1 long): per event time t, the risk set,
    * event count, hazard and cumulative hazard. */
  def hazard(durations: DataFrame): DataFrame = {
    val byT = durations.groupBy(col("dur").as("t"))
      .agg(count(lit(1)).as("all_t"), sum(col("observed")).as("d"))
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val withRisk = byT
      .withColumn("cum_all", sum(col("all_t")).over(wCum))
      .withColumn("n_total", sum(col("all_t")).over(wAll))
      .withColumn("n_risk", col("n_total") - col("cum_all") + col("all_t"))
      .where(col("d") > 0)
      .withColumn("term",
        round(col("d").cast("double") / col("n_risk"), 12)
          .cast("decimal(38,12)"))
    withRisk
      .withColumn("cum_h", sum(col("term")).over(wCum))
      .select(col("t"), col("n_risk"), col("d"),
        round(col("d").cast("double") / col("n_risk"), 9).as("hazard"),
        round(col("cum_h").cast("double"), 9).as("cum_hazard"))
      .orderBy(col("t").asc_nulls_last)
  }

  /** Q170: signup→first-purchase conversion hazard, censored at the
    * corpus horizon for users who have not (yet) purchased. */
  private def q170(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    val signup = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val firstPurch = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
      .join(signup, Seq("user_id"))
      .where(col("p_ts") >= col("s_ts"))
      .groupBy(col("user_id")).agg(min(col("p_ts")).as("p_first"))
    val horizon = ev.agg(max(col("ts")).as("end_ts"))
    val durs = signup.join(firstPurch, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        when(col("p_first").isNotNull,
          datediff(to_date(col("p_first")), to_date(col("s_ts"))))
          .otherwise(datediff(to_date(col("end_ts")), to_date(col("s_ts"))))
          .cast("bigint").as("dur"),
        when(col("p_first").isNotNull, lit(1L)).otherwise(lit(0L))
          .as("observed"))
    hazard(durs)
  }

  private val q170Sql: String =
    """WITH signup AS (
      |  SELECT user_id, MIN(ts) AS s_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |conv AS (
      |  SELECT e.user_id, MIN(e.ts) AS p_first
      |  FROM events e JOIN signup s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
      |  GROUP BY e.user_id),
      |fin AS (SELECT MAX(ts) AS end_ts FROM events),
      |durs AS (
      |  SELECT CASE WHEN c.p_first IS NOT NULL
      |      THEN date_diff('day', CAST(s.s_ts AS DATE), CAST(c.p_first AS DATE))
      |      ELSE date_diff('day', CAST(s.s_ts AS DATE), CAST(f.end_ts AS DATE))
      |      END AS dur,
      |    CASE WHEN c.p_first IS NOT NULL THEN 1 ELSE 0 END AS observed
      |  FROM signup s LEFT JOIN conv c ON s.user_id = c.user_id
      |  CROSS JOIN fin f),
      |byt AS (
      |  SELECT dur AS t, CAST(COUNT(*) AS BIGINT) AS all_t,
      |    CAST(SUM(observed) AS BIGINT) AS d
      |  FROM durs GROUP BY dur),
      |cum AS (
      |  SELECT t, all_t, d,
      |    CAST(SUM(all_t) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_all,
      |    CAST(SUM(all_t) OVER () AS BIGINT) AS n_total
      |  FROM byt),
      |risk AS (
      |  SELECT t, d, n_total - cum_all + all_t AS n_risk,
      |    CAST(ROUND(CAST(d AS DOUBLE) / (n_total - cum_all + all_t), 12)
      |      AS DECIMAL(38,12)) AS term
      |  FROM cum WHERE d > 0)
      |SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk, d,
      |  ROUND(CAST(d AS DOUBLE) / n_risk, 9) AS hazard,
      |  ROUND(CAST(SUM(term) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 9)
      |    AS cum_hazard
      |FROM risk ORDER BY t ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q170_hazard", q170, Some(q170Sql)))
}
