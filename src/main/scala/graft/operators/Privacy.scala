package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12: l-diversity audit — the sensitive-attribute companion to
  * q142's k-anonymity. k-anonymity bounds re-identification by class
  * SIZE, but a large class whose members all share one sensitive value
  * leaks that value to anyone who can place a person in the class
  * (the homogeneity attack; Machanavajjhala et al., ICDE 2006).
  * Distinct l-diversity requires ≥ l distinct sensitive values per
  * quasi-identifier class; the audit reports, per class, its row count
  * and distinct-sensitive count plus the pass/fail verdict — the table
  * an anonymization pipeline gates a release on.
  *
  * Oracle parity: counts and COUNT(DISTINCT) only — exact by
  * construction in both engines.
  *
  * Scale: one shuffle on the quasi-identifier key; the distinct count
  * is Spark's two-level expand aggregate (partial per partition). QI
  * classes are small by definition of the audit (|nations × segments|
  * here); the fact side is the joined order stream, aggregated
  * map-side first.
  */
object Privacy {

  /** PUBLIC API — distinct l-diversity over one row per (entity,
    * sensitive) observation: per quasi-identifier class (the `qi`
    * columns), rows, distinct sensitive values, and whether the class
    * meets the `l` floor. */
  def lDiversity(rows: DataFrame, qi: Seq[String], sensitive: String,
      l: Int = 3): DataFrame = {
    val qiCols: Seq[Column] = qi.map(col)
    rows.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitive)).as("l_div"))
      .withColumn("diverse", col("l_div") >= l)
      .orderBy(qi.map(c => col(c).asc_nulls_last): _*)
  }

  /** Q174: l-diversity of order priorities over the customer
    * (nationkey, mktsegment) quasi-identifier — q142's classes, now
    * audited for sensitive-value homogeneity. */
  private def q174(s: SparkSession, dir: String): DataFrame =
    lDiversity(
      Tables.t(s, dir, "orders")
        .join(Tables.t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("o_orderpriority")),
      qi = Seq("c_nationkey", "c_mktsegment"),
      sensitive = "o_orderpriority")

  private val q174Sql: String =
    """SELECT c_nationkey, c_mktsegment,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l_div,
      |  COUNT(DISTINCT o_orderpriority) >= 3 AS diverse
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2
      |ORDER BY c_nationkey ASC NULLS LAST, c_mktsegment ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q174_l_diversity", q174, Some(q174Sql)))
}
