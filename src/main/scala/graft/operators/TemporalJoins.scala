package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the `events` table: interval (range)
  * self-join and as-of join — the two event-time join shapes every
  * analytics stack needs and plain equi-join machinery can't express.
  *
  * Both are single-exchange plans keyed on `user_id`:
  * - the interval join shuffles each side once and evaluates the time
  *   band as a join residual inside SMJ — no cross product ever
  *   materializes;
  * - the as-of join is the union+running-window form: ONE shuffle of the
  *   combined stream, then a per-user ordered scan carrying the last
  *   match forward. The naive join-then-max-per-key double-shuffles and
  *   explodes on hot users; this shape is O(n log n) per partition and
  *   skew-bounded by the per-user event count.
  * Reference justification: arbitrary chained ShuffleDependency DAGs
  * (celeborn: tests/spark-it/.../CelebornFetchFailureSuite.scala:169-210).
  */
object TemporalJoins {

  /** Q37: same-user event pairs where b follows a within 5 minutes,
    * aggregated into a (type → type) transition matrix. */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
    e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") > col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 5 MINUTES"))
      .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("t1").asc_nulls_last, col("t2").asc_nulls_last)
  }

  private val q37Sql =
    """SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND b.ts > a.ts
      |  AND b.ts <= a.ts + INTERVAL 5 MINUTE
      |GROUP BY t1, t2
      |ORDER BY t1 ASC NULLS LAST, t2 ASC NULLS LAST""".stripMargin

  /** Q38: as-of join — for every purchase, the most recent click at or
    * before it by the same user (NULL when none precedes). */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
    // pri orders clicks before purchases at equal timestamps, so a
    // same-instant click counts as "at or before"
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("pri"),
        col("ts").as("click_ts"), lit(null).cast("long").as("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("pri"),
        lit(null).cast("timestamp").as("click_ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("pri").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click", last(col("click_ts"), ignoreNulls = true).over(w))
      .where(col("pri") === 1)
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("last_click"))
      .orderBy(col("event_id").asc_nulls_last)
  }

  /** DuckDB's native ASOF JOIN is the oracle — an independent
    * implementation of the same semantics. */
  private val q38Sql =
    """SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.ts AS last_click
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY event_id ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q37_interval_join", q37, Some(q37Sql)),
    QueryDef("q38_asof_join", q38, Some(q38Sql)))
}
