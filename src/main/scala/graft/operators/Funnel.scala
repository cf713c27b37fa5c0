package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over the event log: how many users
  * progressed through a stage sequence (view → click → purchase) in
  * event-time order — each stage's timestamp must be at or after the
  * previous stage's. The sequential-pattern query class (product
  * funnels, pipeline SLA stages) that plain per-type counts cannot
  * answer.
  *
  * Implemented as a cascade of conditional minimums: stage k's entry
  * time is the user's earliest stage-k event at/after their stage-k−1
  * entry. Each pass is a conditional aggregate keyed by user_id; all
  * passes and their joins share the ONE user_id hash partitioning (the
  * q60 lesson — plan-audited: exactly one corpus exchange per stage
  * scan, no re-shuffle between stages), and the final stage counts are
  * a single-row aggregate. Exact timestamps and counts only — nothing
  * floats.
  */
object Funnel {

  /** PUBLIC API — ordered funnel over (user_id, ts, event_type).
    * `stages` is the ordered event-type sequence. Returns one row per
    * stage: (stage_idx, stage, n_users) where n_users reached it in
    * order. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    // t0: earliest first-stage event per user
    var reached = events
      .where(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    def stageCount(df: DataFrame, i: Int, st: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    val counts = Seq.newBuilder[DataFrame]
    counts += stageCount(reached, 0, stages.head)
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = s"t${i - 1}"
      reached = events
        .where(col("event_type") === st)
        .join(reached, "user_id")
        .where(col("ts") >= col(prev))
        .groupBy(col("user_id")).agg(min(col("ts")).as(s"t$i"))
      counts += stageCount(reached, i, st)
    }
    counts.result().reduce(_ unionAll _)
      .orderBy(col("stage_idx").asc_nulls_last)
  }

  private def q68(s: SparkSession, dir: String): DataFrame =
    funnel(Tables.t(s, dir, "events"), Seq("view", "click", "purchase"))

  private val q68Sql =
    """WITH s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s1 AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
      |  JOIN s0 ON e.user_id = s0.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= s0.t0 GROUP BY e.user_id),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= s1.t1 GROUP BY e.user_id)
      |SELECT stage_idx, stage, n_users FROM (
      |  SELECT 0 AS stage_idx, 'view' AS stage, COUNT(*)::BIGINT AS n_users FROM s0
      |  UNION ALL
      |  SELECT 1, 'click', COUNT(*)::BIGINT FROM s1
      |  UNION ALL
      |  SELECT 2, 'purchase', COUNT(*)::BIGINT FROM s2)
      |ORDER BY stage_idx ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q68_funnel", q68, Some(q68Sql)))
}
