package graft.operators

import graft.{Canon, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning (DPP): the runtime analogue of q44's
  * planning-time partition pruning — the partition filter is not known
  * until the dimension side is evaluated, so Catalyst injects a
  * `dynamicpruning` subquery that reuses the dim's broadcast to skip
  * fact partitions at execution time. This is the engine-side mirror of
  * the reference's AQE range reads (worker sorts and serves only the
  * requested slice, celeborn: worker/.../PartitionFilesSorter.java:208-224):
  * in both cases the system reads the subset the runtime proved
  * relevant, not the layout's full extent.
  *
  * At 100 TB this is the difference between scanning 7 years of a
  * date-partitioned fact table and scanning the 2 years a filtered dim
  * actually references — no operator change, just layout + join. The
  * `dynamicpruning` expression in PartitionFilters is plan-asserted in
  * `PruningSpec`.
  */
object Pruning {

  /** The year-partitioned orders layout, built once per (JVM, sf dir) —
    * input preparation, not the operator under test (same memoization
    * contract as RateLimited.sourceLayout). */
  private val layouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def yearPartitionedOrders(s: SparkSession, dir: String): String =
    layouts.computeIfAbsent(dir, { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_dpp_orders").toString
      Tables.t(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.partitionBy("o_year").mode("overwrite").parquet(out)
      out
    })

  /** q77: ship-years of returned lineitems decide which order-year
    * partitions exist at all for the aggregate — the fact side scans
    * only those partitions, proven at runtime by the dim subquery. */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val fact = s.read.parquet(yearPartitionedOrders(s, dir))
    val dim = Tables.t(s, dir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select(year(col("l_shipdate")).as("o_year")).distinct()
    fact.join(dim, Seq("o_year"))
      // partition-dir discovery types o_year as INT; the oracle's year()
      // is BIGINT — cast for schema parity
      .groupBy(col("o_year").cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        Canon.dsum(col("o_totalprice"), 2).as("total_price"))
      .orderBy(col("o_year").asc_nulls_last)
  }

  private val q77Sql =
    s"""WITH dim AS (SELECT DISTINCT year(l_shipdate) AS o_year FROM lineitem
       |  WHERE l_returnflag = 'R')
       |SELECT year(o_orderdate) AS o_year, COUNT(*) AS n_orders,
       |  ${Canon.sqlDsum("o_totalprice", 2)} AS total_price
       |FROM orders JOIN dim ON year(o_orderdate) = dim.o_year
       |GROUP BY 1 ORDER BY o_year ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q77_dpp_join", q77, Some(q77Sql)))
}
