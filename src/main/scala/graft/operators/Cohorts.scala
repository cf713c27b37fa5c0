package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cohort retention analysis over the event log: bucket users by their
  * first-activity week (the cohort), then count how many of each
  * cohort are active again k weeks later — the retention-matrix query
  * class (alongside q68's funnels) that product analytics runs on
  * 100 TB event logs.
  *
  * Plan shape: one pass computes (user, active_week) distinct pairs
  * and each user's first week — both keyed by user_id, sharing one
  * hash partitioning; the matrix aggregate over (cohort, weeks_since)
  * is bounded by weeks², corpus-size-independent. All arithmetic is
  * integer epoch-microsecond division — nothing floats.
  */
object Cohorts {

  private val WeekUs = 7L * 86400L * 1000000L

  /** PUBLIC API — weekly retention matrix over (user_id, ts). Returns
    * (cohort_week, weeks_since, n_users): users first seen in
    * cohort_week that were active weeks_since weeks after it. */
  def retention(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"),
        expr(s"unix_micros(ts) div $WeekUs").as("week"))
      .distinct()
    val first = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(first, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week").asc_nulls_last,
        col("weeks_since").asc_nulls_last)
  }

  private def q69(s: SparkSession, dir: String): DataFrame =
    retention(Tables.t(s, dir, "events"))

  private val q69Sql =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
      |first AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id)
      |SELECT cohort_week, week - cohort_week AS weeks_since,
      |  COUNT(*)::BIGINT AS n_users
      |FROM weeks JOIN first USING (user_id)
      |GROUP BY cohort_week, weeks_since
      |ORDER BY cohort_week ASC NULLS LAST, weeks_since ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q69_retention", q69, Some(q69Sql)))
}
