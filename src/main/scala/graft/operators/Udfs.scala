package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Q30 — the user-extension surface: a scalar UDF, a typed Aggregator
  * (UDAF), and a generator (the UDTF surface is exercised by explode in
  * TextAnalysis). All deterministic so the DuckDB oracle can replay them.
  */
object Udfs {

  /** Weighted average of l_extendedprice by l_quantity, accumulated in
    * scaled longs so partial-merge order cannot perturb the result
    * (doubles would make the answer partition-order-dependent).
    * Weights and prices have ≤2 decimals → ×100 scaling is exact;
    * products fit a Long at any realistic group size... but sums of
    * price*qty*10^4 over millions of rows approach 2^63, so the buffer
    * uses BigInt-free long math at e4 scale with overflow headroom
    * checked in UdfSpec.
    */
  class WeightedAvg extends Aggregator[Row, (Long, Long), Double] {
    private def cents(x: Double): Long = math.round(x * 100.0)
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), r: Row): (Long, Long) = {
      val price = cents(r.getDouble(0)) // l_extendedprice in cents
      val qty = cents(r.getDouble(1)) // l_quantity in hundredths
      (b._1 + price * qty, b._2 + qty)
    }
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    // No rounding: both sides divide identical exact integer sums, so the
    // IEEE double result is bit-identical with the oracle's.
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0) 0.0 else b._1.toDouble / b._2.toDouble / 100.0
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Q30: scalar UDF (plus-tax) + typed Aggregator per return flag. */
  private def q30(s: SparkSession, dir: String): DataFrame = {
    // math.round = floor(x+0.5): matches DuckDB's half-away-from-zero
    // rounding for the positive domain of prices.
    val plusTax = udf((price: Double, tax: Double) => math.round(price * (1.0 + tax) * 100.0) / 100.0)
    val wavg = udaf(new WeightedAvg(), Encoders.row(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("l_extendedprice", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("l_quantity", org.apache.spark.sql.types.DoubleType)))))
    Tables.t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
        graft.Canon.dsum(plusTax(col("l_extendedprice"), col("l_tax")), 2).as("sum_taxed"))
      .orderBy(col("l_returnflag").asc_nulls_last)
  }

  private val q30Sql =
    """SELECT l_returnflag,
      |  (SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT))
      |   / SUM(CAST(round(l_quantity * 100) AS BIGINT))) / 100.0 AS wavg_price,
      |  CAST(SUM(CAST(round(l_extendedprice * (1 + l_tax) * 100) / 100.0 AS DECIMAL(28,2))) AS DOUBLE) AS sum_taxed
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q30_udf_udaf", q30, Some(q30Sql)))
}
