package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8: incremental aggregate maintenance — the batch form of what
  * q89's streaming foreachBatch upsert does continuously: a
  * materialized per-key aggregate is MAINTAINED under an insert-only
  * delta by merging re-aggregatable partial states (counts add, decimal
  * sums add, min/max fold), never rescanning the base. This is the
  * celeborn-side "append to the committed partition file" discipline
  * (worker merge: PushDataHandler.scala:148) as a data-pipeline
  * operator, and the q95 (incremental dedup index) pattern applied to
  * aggregation state.
  *
  * The registry entry proves the MAINTENANCE LAW end-to-end: it splits
  * the fixture deterministically into base (earlier ship dates) and
  * delta (the rest), aggregates each independently, merges the partial
  * states, and outputs the merged profile — which the oracle computes
  * by aggregating the WHOLE table directly. Hash-equality of the two
  * IS the incremental-view-maintenance proof, run by the driver.
  *
  * Note the avg discipline: the maintained state carries (sum, count),
  * never the average — averages do not merge. Derived columns are
  * computed at read time from the merged state. */
object Incremental {

  /** PUBLIC API — merge two compatible per-key aggregate states
    * (n, sum_qty, min_price, max_price per key). */
  def mergeStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sum_qty")).as("sum_qty"),
        min(col("min_price")).as("min_price"),
        max(col("max_price")).as("max_price"))

  private def state(df: DataFrame): DataFrame =
    df.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("l_quantity").cast("decimal(28,2)")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  /** Q128: maintained aggregate == direct aggregate (the IVM law). */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    val cut = lit("1998-01-01").cast("timestamp")
    val base = state(li.where(col("l_shipdate") < cut))
    val delta = state(li.where(col("l_shipdate") >= cut))
    mergeStates(base, delta, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("min_price"), col("max_price"),
        // derived at read time from the merged state — the reason the
        // state carries (sum, n) and never a pre-divided average
        round(col("sum_qty").cast("double") / col("n"), 6).as("avg_qty"))
      .orderBy(col("l_returnflag").asc_nulls_last)
  }

  /** Oracle: ONE direct aggregation of the whole table — agreement is
    * the maintenance proof, not a replay of the split. */
  private val q128Sql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
      |    / COUNT(*), 6) AS avg_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q128_delta_agg", q128, Some(q128Sql)))
}
