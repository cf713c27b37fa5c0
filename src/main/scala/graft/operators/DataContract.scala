package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8: data-contract validation — the expectation-checking pass a
  * production pipeline runs on every ingest (null keys, domain ranges,
  * referential integrity, uniqueness) producing a per-rule violation
  * report instead of a boolean. The reference's integrity analogue is
  * its per-batch CRC + duplicate-batch filtering on read
  * (celeborn: CelebornInputStream.java:864-899); here the contract is
  * on the DATA, not the transport.
  *
  * Plan shape per rule class: domain + null rules fold into ONE
  * conditional-aggregate scan (no per-rule rescans); referential
  * integrity is one anti join against the parent keys; uniqueness is
  * one keyed count. The report is a handful of rows. */
object DataContract {

  /** Q129: four-rule contract over lineitem. */
  private def q129(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    // rules 1+2 AND the row count: one shared scan, conditional
    // aggregation — no driver-side count() action, no per-rule rescans
    val scan = li.agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).cast("long").as("qty_range"),
      sum(when(col("l_orderkey").isNull || col("l_partkey").isNull, 1L)
        .otherwise(0L)).cast("long").as("null_keys"),
      count(lit(1)).as("checked"))
    val checked = scan.select(col("checked"))
    val scanRow = scan.select(
      explode(array(
        struct(lit("qty_in_[1,50]").as("rule"), col("qty_range").as("violations")),
        struct(lit("keys_not_null").as("rule"), col("null_keys").as("violations"))))
        .as("r"))
      .select(col("r.rule"), col("r.violations"))
    // rule 3: referential integrity — orphans via anti join
    val orphans = li.select(col("l_orderkey"))
      .join(Tables.t(s, dir, "orders").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orderkey_fk_exists").as("rule"), col("violations"))
    // rule 4: uniqueness of (orderkey, linenumber) — surplus rows
    val dups = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c") - 1).otherwise(0L)), lit(0L))
        .cast("long").as("violations"))
      .select(lit("orderkey_linenumber_unique").as("rule"), col("violations"))
    scanRow.unionByName(orphans).unionByName(dups)
      .crossJoin(broadcast(checked))
      .orderBy(col("rule").asc_nulls_last)
  }

  private val q129Sql =
    """WITH n AS (SELECT COUNT(*) AS checked FROM lineitem)
      |SELECT rule, violations, checked FROM (
      |  SELECT 'qty_in_[1,50]' AS rule,
      |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
      |      THEN 1 ELSE 0 END) AS BIGINT) AS violations
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'keys_not_null',
      |    CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orderkey_fk_exists',
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |  UNION ALL
      |  SELECT 'orderkey_linenumber_unique',
      |    CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
      |  FROM (SELECT COUNT(*) AS c FROM lineitem
      |        GROUP BY l_orderkey, l_linenumber) g
      |  WHERE c > 1) v
      |CROSS JOIN n
      |ORDER BY rule ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q129_data_contract", q129, Some(q129Sql)))
}
