package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12: relational integrity audits — the checks a warehouse
  * declares as constraints but a lake must MEASURE. Two operators:
  *
  *  - [[refIntegrity]]: orphan audit of a foreign-key edge — fact rows
  *    whose key has no match in the dimension (plus the distinct
  *    missing keys). All of a fact's edges are audited in ONE pass:
  *    left-join every dimension's key set and count nulls per edge in
  *    the same aggregate, instead of one anti-join scan per edge.
  *  - [[fdAudit]]: functional-dependency audit — does column A
  *    determine column B? Reports, per declared FD, the violating
  *    determinant values (>1 distinct dependent) and the row mass
  *    under them; the schema-inference and join-safety question
  *    ("can I key a dimension on this column?").
  *
  * Oracle parity: counts, COUNT(DISTINCT), MAX, and one rate division
  * — exact in both engines.
  *
  * Scale: refIntegrity joins each dimension's DISTINCT KEY COLUMN only
  * (kilobytes for real dimensions — broadcast; fact-sized referenced
  * tables like orders shuffle on the join key, the honest cost of the
  * check). fdAudit is one shuffle on the determinant; both emit
  * constant-size audit rows.
  *
  * Reference anchor: celeborn validates shuffle-file integrity with
  * per-batch CRCs and epoch checks (worker/.../PartitionDataWriter);
  * key-reference and dependency integrity are the table-level
  * analogues a data plane needs.
  */
object Integrity {

  /** PUBLIC API — one audit row for a fact table against its
    * dimensions: `edges` maps edge name -> (fkCol in fact, dim key
    * DataFrame with exactly one column). One fact pass for all edges. */
  def refIntegrity(fact: DataFrame,
      edges: Seq[(String, (String, DataFrame))]): DataFrame = {
    // edge names may contain dots (table.fk); helper columns need
    // identifier-safe names or Spark parses them as qualified paths
    def safe(name: String): String = name.replaceAll("[^A-Za-z0-9_]", "_")
    val joined = edges.foldLeft(fact) { case (df, (name, (fk, dimKey))) =>
      val pk = dimKey.columns.head
      df.join(dimKey.select(col(pk).as(s"__pk_${safe(name)}")).distinct(),
        col(fk) === col(s"__pk_${safe(name)}"), "left")
    }
    val aggs = edges.flatMap { case (name, (fk, _)) =>
      Seq(
        sum(when(col(s"__pk_${safe(name)}").isNull, 1L).otherwise(0L))
          .as(s"orphans_${safe(name)}"),
        countDistinct(when(col(s"__pk_${safe(name)}").isNull, col(fk)))
          .as(s"missing_${safe(name)}"))
    }
    // r17 (driver-job diet): the audit is ONE row wide — unpivot it
    // with a single explode instead of one union branch (and one AQE
    // stage-job chain) per edge. The former shape additionally needed
    // an EAGER construction-time localCheckpoint so the branches would
    // not each re-derive the whole fact aggregate (the q126
    // double-derivation lesson); with a single consumer the checkpoint
    // is gone entirely — q175's five refIntegrity calls dropped from
    // 46 jobs / 3.1 s to a single-digit job count.
    val allAggs = count(lit(1)).as("fact_rows") +: aggs
    val totals = joined.agg(allAggs.head, allAggs.tail: _*)
    val edgeStructs = array(edges.map { case (name, _) =>
      struct(lit(name).as("edge"),
        col(s"orphans_${safe(name)}").as("orphan_rows"),
        col(s"missing_${safe(name)}").as("missing_keys"))
    }: _*)
    totals.select(col("fact_rows"), explode(edgeStructs).as("e"))
      .select(col("e.edge").as("edge"), col("fact_rows"),
        col("e.orphan_rows").as("orphan_rows"),
        round(col("e.orphan_rows").cast("double")
          / col("fact_rows"), 9).as("orphan_rate"),
        col("e.missing_keys").as("missing_keys"))
      .orderBy(col("edge").asc_nulls_last)
  }

  /** PUBLIC API — functional-dependency audit: for each declared
    * lhs -> rhs, the distinct determinant count, violating determinant
    * count (>1 distinct rhs), row mass under violators, and the worst
    * fan-out. `holds` is the release gate. */
  def fdAudit(df: DataFrame, fds: Seq[(String, String)]): DataFrame =
    fds.map { case (lhs, rhs) =>
      df.groupBy(col(lhs))
        .agg(count(lit(1)).as("n"), countDistinct(col(rhs)).as("nd"))
        .groupBy(lit(s"$lhs->$rhs").as("fd"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("violating_lhs"),
          sum(when(col("nd") > 1, col("n")).otherwise(0L))
            .cast("long").as("violating_rows"),
          max(col("nd")).as("max_fanout"))
        .withColumn("holds", col("violating_lhs") === 0L)
    }.reduce(_.unionAll(_)).orderBy(col("fd").asc_nulls_last)

  /** Q175: the full fixture FK graph — lineitem's three edges in one
    * pass, plus orders→customer, customer→nation, supplier→nation,
    * nation→region, unioned into one audit table. */
  private def q175(s: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.t(s, dir, n)
    val li = refIntegrity(t("lineitem"), Seq(
      "lineitem.orderkey" -> ("l_orderkey", t("orders").select("o_orderkey")),
      "lineitem.partkey" -> ("l_partkey", t("part").select("p_partkey")),
      "lineitem.suppkey" -> ("l_suppkey", t("supplier").select("s_suppkey"))))
    val oc = refIntegrity(t("orders"), Seq(
      "orders.custkey" -> ("o_custkey", t("customer").select("c_custkey"))))
    val cn = refIntegrity(t("customer"), Seq(
      "customer.nationkey" -> ("c_nationkey", t("nation").select("n_nationkey"))))
    val sn = refIntegrity(t("supplier"), Seq(
      "supplier.nationkey" -> ("s_nationkey", t("nation").select("n_nationkey"))))
    val nr = refIntegrity(t("nation"), Seq(
      "nation.regionkey" -> ("n_regionkey", t("region").select("r_regionkey"))))
    li.unionAll(oc).unionAll(cn).unionAll(sn).unionAll(nr)
      .orderBy(col("edge").asc_nulls_last)
  }

  private val q175Sql: String = {
    def edge(name: String, fact: String, fk: String, dim: String,
        pk: String): String =
      s"""SELECT '$name' AS edge,
         |  CAST(COUNT(*) AS BIGINT) AS fact_rows,
         |  CAST(SUM(CASE WHEN d.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS orphan_rows,
         |  ROUND(CAST(SUM(CASE WHEN d.$pk IS NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / COUNT(*), 9) AS orphan_rate,
         |  CAST(COUNT(DISTINCT CASE WHEN d.$pk IS NULL THEN f.$fk END)
         |    AS BIGINT) AS missing_keys
         |FROM $fact f LEFT JOIN (SELECT DISTINCT $pk FROM $dim) d
         |  ON f.$fk = d.$pk""".stripMargin
    Seq(
      edge("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
      edge("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
      edge("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY edge ASC NULLS LAST")
  }

  /** Q176: candidate-key and dependency audit on the fixture — one
    * FD that must hold (orders' primary key determines its status)
    * and three that fail with measured violation mass. */
  private def q176(s: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.t(s, dir, n)
    fdAudit(t("orders"), Seq(
      "o_orderkey" -> "o_orderstatus",
      "o_custkey" -> "o_orderpriority"))
      .unionAll(fdAudit(t("lineitem"), Seq(
        "l_partkey" -> "l_extendedprice")))
      .unionAll(fdAudit(t("customer"), Seq(
        "c_nationkey" -> "c_mktsegment")))
      .orderBy(col("fd").asc_nulls_last)
  }

  private val q176Sql: String = {
    def fd(table: String, lhs: String, rhs: String): String =
      s"""SELECT '$lhs->$rhs' AS fd,
         |  CAST(COUNT(*) AS BIGINT) AS n_lhs,
         |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS violating_lhs,
         |  CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
         |    AS violating_rows,
         |  CAST(MAX(nd) AS BIGINT) AS max_fanout,
         |  SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
         |FROM (SELECT $lhs, COUNT(*) AS n, COUNT(DISTINCT $rhs) AS nd
         |  FROM $table GROUP BY $lhs)""".stripMargin
    Seq(
      fd("orders", "o_orderkey", "o_orderstatus"),
      fd("orders", "o_custkey", "o_orderpriority"),
      fd("lineitem", "l_partkey", "l_extendedprice"),
      fd("customer", "c_nationkey", "c_mktsegment"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd ASC NULLS LAST")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q175_ref_integrity", q175, Some(q175Sql)),
    QueryDef("q176_fd_audit", q176, Some(q176Sql)))
}
