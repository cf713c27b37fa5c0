package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9: concentration profiling — per-group GINI COEFFICIENT of a
  * value distribution (0 = perfectly even, →1 = one member holds
  * everything), the summary a selection/mixing pipeline watches so one
  * source/customer/domain does not silently dominate a mix (q84/q88's
  * diagnostics sibling).
  *
  * Spark-first shape: the exact Gini needs every group fully sorted
  * (the q126 scale-killer shape), so the registry entry computes the
  * GROUPED-DATA Gini over the q123 mergeable histogram: bin counts +
  * midpoint masses give G = 1 − Σ f_k·(S_{k−1} + S_k)/S_B — two
  * bins-sized keyed aggregates and a ≤B-row window per group, with the
  * one-bin-width error bound of every sketch in this family (vs the
  * exact sorted Gini asserted in OlsBasketsSpec).
  *
  * Determinism/oracle: counts are exact integers; midpoints and the
  * cumulative fold are the same double trees on both engines over
  * bins-sized frames (ordered by bin), so DuckDB re-derives G
  * exactly. */
object Gini {

  /** PUBLIC API — per-group histogram-sketch Gini of (g, x) rows with
    * x ≥ 0: (g, n, gini), 9-dp rounded. */
  def giniSketch(base: DataFrame): DataFrame = {
    val hist = RobustStats.cumHist(base)
      .withColumn("m", col("lo") + (col("bin").cast("double") + 0.5) * col("w"))
      // degenerate group (hi == lo): all mass at one value — G = 0 via
      // the same formula since every midpoint equals lo... except w = 0
      // makes m = lo for bin 0 only, which IS the single populated bin
      .withColumn("v", col("cnt").cast("double") * col("m"))
    val wb = Window.partitionBy(col("g")).orderBy(col("bin").asc_nulls_last)
    val cum = hist
      .withColumn("sv", sum(col("v")).over(wb))
      .withColumn("sv_before", col("sv") - col("v"))
    cum.groupBy(col("g"))
      .agg(min(col("n")).as("n"),
        // decimal-accumulated (Canon.dsum discipline): a bare double sum
        // over the ≤B bin terms would be combine-order-dependent
        (lit(1.0) - sum((col("cnt").cast("double") * (col("sv_before") + col("sv")))
            .cast("decimal(38,12)")).cast("double")
          / (min(col("n")).cast("double") * max(col("sv")))).as("gini"))
      .select(col("g"), col("n"), round(col("gini"), 9).as("gini"))
      .orderBy(col("g").asc_nulls_last)
  }

  /** Q151: Gini of per-customer 1997 revenue within each nation — the
    * "does one whale customer own the nation's revenue" audit. */
  private def q151(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.t(s, dir, "orders")
      .where(year(col("o_orderdate")) === 1997)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(28,2)")).cast("double").as("x"))
    val base = rev.join(Tables.t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("g"), col("x"))
    giniSketch(base)
  }

  private val q151Sql = {
    val hist = RobustStats.cumHistSqlFor("",
      """SELECT n_name AS g, x FROM (
        |    SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS x
        |    FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997 GROUP BY o_custkey) r
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey""".stripMargin)
    s"""WITH $hist,
       |mid AS (
       |  SELECT c.g, c.bin, c.cnt, rng.n,
       |    CAST(c.cnt AS DOUBLE) *
       |      (rng.lo + (CAST(c.bin AS DOUBLE) + 0.5) * ((rng.hi - rng.lo) / ${RobustStats.B}.0)) AS v
       |  FROM cum c JOIN rng USING (g)),
       |folded AS (
       |  SELECT g, bin, cnt, n, v,
       |    SUM(v) OVER (PARTITION BY g ORDER BY bin ASC) AS sv,
       |    SUM(v) OVER (PARTITION BY g ORDER BY bin ASC) - v AS sv_before
       |  FROM mid)
       |SELECT g, MIN(n) AS n,
       |  ROUND(1.0 - CAST(SUM(CAST(CAST(cnt AS DOUBLE) * (sv_before + sv)
       |      AS DECIMAL(38,12))) AS DOUBLE)
       |    / (CAST(MIN(n) AS DOUBLE) * MAX(sv)), 9) AS gini
       |FROM folded
       |GROUP BY g
       |ORDER BY g ASC NULLS LAST""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q151_gini", q151, Some(q151Sql)))
}
