package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8: SCD Type-2 merge decision — the warehouse
  * dimension-history shape: given the CURRENT dimension and an incoming
  * SNAPSHOT, classify every key as unchanged / changed (close the old
  * row, open a new one) / new, in ONE full-outer join. q66 (upsert)
  * owns the write mechanics; this operator owns the temporal-versioning
  * DECISION, which is where SCD2 bugs live (a predicate in the wrong
  * place silently turns history into overwrite — same trap class as
  * q110's outer join).
  *
  * The fixture derives both sides deterministically from the customer
  * table: keys ≡0 (mod 13) are "not yet loaded" (absent from current →
  * classified new), keys ≡0 (mod 7) arrive with a +100.00 balance
  * (classified changed). Output: the changed/new decision rows plus
  * their old/new values — the exact rows an SCD2 writer would act on.
  * The decimal comparison ensures change detection never trips on
  * double formatting. */
object Scd {

  /** PUBLIC API — SCD2 merge classification of snapshot vs current on
    * `key`; `tracked` is the versioned attribute. */
  def scd2Decide(current: DataFrame, snapshot: DataFrame, key: String,
      tracked: String): DataFrame = {
    val cur = current.select(col(key).as("k"),
      col(tracked).cast("decimal(18,2)").as("old_val"))
    val snap = snapshot.select(col(key).as("k"),
      col(tracked).cast("decimal(18,2)").as("new_val"))
    cur.join(snap, Seq("k"), "full_outer")
      .withColumn("action",
        when(col("old_val").isNull, "insert")
          .when(col("new_val").isNull, "delete")
          .when(col("old_val") =!= col("new_val"), "update")
          .otherwise("unchanged"))
  }

  /** Q135: the SCD2 action rows for the derived snapshot (changed and
    * new keys only — what the writer acts on — plus action counts are
    * recoverable from the full decision). */
  private def q135(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables.t(s, dir, "customer")
    val current = customer.where(col("c_custkey") % 13 =!= 0)
    val snapshot = customer.select(col("c_custkey"),
      when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
        .otherwise(col("c_acctbal")).as("c_acctbal"))
    scd2Decide(current, snapshot, "c_custkey", "c_acctbal")
      .where(col("action") =!= "unchanged")
      .select(col("k").as("c_custkey"), col("action"),
        col("old_val").cast("double").as("old_bal"),
        col("new_val").cast("double").as("new_bal"))
      .orderBy(col("c_custkey").asc_nulls_last)
  }

  private val q135Sql =
    """WITH current AS (
      |  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS old_val
      |  FROM customer WHERE c_custkey % 13 <> 0),
      |snap AS (
      |  SELECT c_custkey,
      |    CAST(CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
      |              ELSE c_acctbal END AS DECIMAL(18,2)) AS new_val
      |  FROM customer)
      |SELECT COALESCE(c.c_custkey, s.c_custkey) AS c_custkey,
      |  CASE WHEN c.old_val IS NULL THEN 'insert'
      |       WHEN s.new_val IS NULL THEN 'delete'
      |       ELSE 'update' END AS action,
      |  CAST(c.old_val AS DOUBLE) AS old_bal,
      |  CAST(s.new_val AS DOUBLE) AS new_bal
      |FROM current c FULL OUTER JOIN snap s ON c.c_custkey = s.c_custkey
      |WHERE c.old_val IS NULL OR s.new_val IS NULL OR c.old_val <> s.new_val
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q135_scd2", q135, Some(q135Sql)))
}
