package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8: first-order Markov transition matrix over per-user event
  * sequences — the behavior-modeling aggregate (next-event prediction
  * priors, anomaly scoring, funnel discovery) next to q68's fixed
  * funnel and q60's sessionization.
  *
  * Plan shape: ONE user-keyed window (lead) forms the consecutive
  * pairs, then a map-side-combined (src, dst) count; the probability
  * normalization joins the src-marginal back — a src-keyed broadcast
  * (|event types|² frame). Ordering ties break on event_id so the
  * pair stream is deterministic on both engines. */
object Transitions {

  /** Q131: event-type transition counts + row-normalized probabilities. */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    val pairs = Tables.t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .where(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val marginal = pairs.groupBy(col("src"))
      .agg(sum(col("n")).cast("long").as("src_total"))
    pairs.join(broadcast(marginal), Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        round(col("n").cast("double") / col("src_total"), 9).as("p"))
      .orderBy(col("src").asc_nulls_last, col("dst").asc_nulls_last)
  }

  private val q131Sql =
    """WITH pairs AS (
      |  SELECT event_type AS src,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS dst
      |  FROM events),
      |cnt AS (
      |  SELECT src, dst, COUNT(*) AS n FROM pairs
      |  WHERE dst IS NOT NULL GROUP BY 1, 2),
      |marg AS (SELECT src, CAST(SUM(n) AS BIGINT) AS src_total
      |  FROM cnt GROUP BY src)
      |SELECT src, dst, n,
      |  ROUND(CAST(n AS DOUBLE) / src_total, 9) AS p
      |FROM cnt JOIN marg USING (src)
      |ORDER BY src ASC NULLS LAST, dst ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q131_transitions", q131, Some(q131Sql)))
}
