package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC-style batch upsert (SCD type 1 merge): apply a changeset —
  * updates and inserts keyed by primary key — onto a base table,
  * last-writer-wins. The MERGE INTO semantics lakehouse tables provide,
  * expressed as a plain keyed outer join so it runs on raw parquet.
  *
  * Plan shape at scale (plan-audited): one full-outer sort-merge join
  * on the primary key — Spark cannot broadcast a full-outer join, so
  * both sides shuffle once, but by the key the base is already
  * clustered/compacted on (q65), so with a bucketed base layout the
  * base-side exchange disappears entirely (q50's lesson applied to
  * maintenance) and the changeset side — typically ≪ base — is the
  * only data moved. The coalesce-per-column projection is codegen'd,
  * no row-by-row lookup anywhere (the reference's analogue: replayed
  * batches reconciled by last-winning attempt,
  * CelebornInputStream.java:864-899).
  */
object Upsert {

  /** PUBLIC API — merge `changes` into `base` on `key`: a change row
    * replaces the base row with its key (update) or appends (insert);
    * base rows without a change pass through. Columns must match. */
  def upsert(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val cols = base.columns.toSeq
    require(changes.columns.toSeq == cols, "base/changes schemas must match")
    val b = cols.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val u = cols.foldLeft(changes)((d, c) => d.withColumnRenamed(c, s"u_$c"))
    b.join(u, col(s"b_$key") === col(s"u_$key"), "full_outer")
      .select(cols.map(c => coalesce(col(s"u_$c"), col(s"b_$c")).as(c)): _*)
  }

  /** q66: deterministic changeset over orders — every key divisible by 7
    * gets its status rewritten and totalprice bumped (update), and a
    * shifted-key copy of every key divisible by 97 is appended (insert).
    * Aggregate proof over the merged table; the oracle replays the same
    * MERGE semantics in SQL (anti-join + union — the textbook rewrite,
    * not this operator's outer-join plan). */
  private def q66(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.t(s, dir, "orders")
    val updates = base.where(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val inserts = base.where(col("o_orderkey") % 97 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("I"))
    upsert(base, updates.unionByName(inserts), "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(28,2)")).cast("double").as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_last)
  }

  private val q66Sql =
    """WITH updates AS (
      |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
      |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |inserts AS (
      |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
      |    'I' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 = 0),
      |changes AS (SELECT * FROM updates UNION ALL SELECT * FROM inserts),
      |merged AS (
      |  SELECT * FROM changes
      |  UNION ALL
      |  SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes))
      |SELECT o_orderstatus, COUNT(*)::BIGINT AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
      |FROM merged GROUP BY o_orderstatus
      |ORDER BY o_orderstatus ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q66_upsert", q66, Some(q66Sql)))
}
