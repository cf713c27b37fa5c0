package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 analytics additions: exact percentiles, pivot, and the
  * explicit salted two-phase aggregation (the hot-key pattern AQE's
  * skew join covers for joins but not for single-key aggregations —
  * same lesson as the reference's skew-partition chunk split,
  * celeborn: client-spark/common/.../CelebornPartitionUtil.java:60-100).
  */
object Analytics {

  /** Q39: exact interpolated percentiles of l_quantity per return flag.
    * l_quantity is integer-valued, so the quarter-fraction interpolation
    * is exact in binary and matches DuckDB's quantile_cont bit-for-bit. */
  private def q39(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        expr("percentile(l_quantity, 0.9)").as("p90"))
      .orderBy(col("l_returnflag").asc_nulls_last)

  private val q39Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  quantile_cont(l_quantity, 0.9) AS p90
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin

  /** Q40: pivot — order counts per priority × status. The pivot column
    * values are pinned so the output schema is static (at scale the
    * distinct-value discovery pass is the part to avoid). */
  private def q40(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("n_f"),
        col("O").as("n_o"), col("P").as("n_p"))
      .orderBy(col("o_orderpriority").asc_nulls_last)

  private val q40Sql =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin

  /** Q41: salted two-phase aggregation. Phase 1 spreads each group key
    * over 8 salt buckets (a hot key becomes 8 parallel partial states);
    * phase 2 merges the 8 partials per key. The salt is derived from
    * l_orderkey, so it is deterministic and the final merge is exact —
    * the result must equal the plain GROUP BY the oracle runs. */
  private def q41(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "lineitem")
      .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("l_quantity").cast("decimal(28,2)")).as("pq"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("pn")).cast("long").as("n"),
        sum(col("pq")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_last)

  private val q41Sql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q39_percentiles", q39, Some(q39Sql)),
    QueryDef("q40_pivot", q40, Some(q40Sql)),
    QueryDef("q41_salted_agg", q41, Some(q41Sql)))
}
