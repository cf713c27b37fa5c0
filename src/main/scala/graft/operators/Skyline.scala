package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8: 2-D skyline (pareto front) — multi-criteria selection
  * (Börzsönyi et al., ICDE 2001): the rows no other row dominates.
  * Here: parts minimizing p_retailprice while maximizing p_size — "no
  * strictly better deal exists".
  *
  * Spark-first asymptotics (the q62 discipline — same answer, better
  * complexity class than the declarative form): the textbook NOT EXISTS
  * dominance test is an O(n²) inequality self-join (and that is exactly
  * what the INDEPENDENT DuckDB oracle runs); the engine instead uses
  * the sort + running-max sweep — per distinct price, the max size; a
  * row survives iff no strictly-cheaper price reached its size
  * (running max over the price-ordered prefix) and no same-price row
  * strictly exceeds it. One tiny per-price aggregate + one window over
  * the DISTINCT-PRICE frame (not the row frame): O(n log n) total, and
  * the window runs over |prices| rows, not |parts|.
  *
  * At scale the per-price aggregate is a map-side-combined keyed agg;
  * the distinct-price frame is small enough to window cheaply (and the
  * standard d>2 generalization — grid partition, local skylines, merge
  * — keeps the same two-phase shape).
  *
  * Plan contract: gwin=1 — the one unpartitioned window is the
  * running-max sweep over the DISTINCT-minCol frame (domain-bounded:
  * |prices|, never |parts| rows), per the two-phase shape above. */
object Skyline {

  /** PUBLIC API — pareto front minimizing `minCol`, maximizing
    * `maxCol`. Returns the surviving rows of `df`. */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val perPrice = df.groupBy(col(minCol))
      .agg(max(col(maxCol)).as("_gmax"))
    val w = Window.orderBy(col(minCol).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, -1)
    val survivors = perPrice
      .withColumn("_run1", max(col("_gmax")).over(w)) // strictly cheaper prefix
    df.join(survivors, Seq(minCol))
      .where((col("_run1").isNull || col("_run1") < col(maxCol)) &&
        col(maxCol) === col("_gmax"))
      .drop("_gmax", "_run1")
  }

  /** Q127: the price/size pareto front of the part table. */
  private def q127(s: SparkSession, dir: String): DataFrame =
    skyline2d(Tables.t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size")),
      "p_retailprice", "p_size")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_retailprice").asc_nulls_last,
        col("p_partkey").asc_nulls_last)

  /** Independent oracle: the textbook O(n²) NOT EXISTS dominance test —
    * a different algorithm entirely, so agreement checks the sweep's
    * correctness, not its implementation. */
  private val q127Sql =
    """SELECT p_partkey, p_retailprice, p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p_retailprice ASC NULLS LAST, p_partkey ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q127_skyline", q127, Some(q127Sql)))
}
