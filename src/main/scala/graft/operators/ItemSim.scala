package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8: item-item co-occurrence similarity — the classic
  * collaborative-filtering kernel ("parts bought together"): cosine
  * over the order-incidence vectors, which for 0/1 baskets reduces to
  * cooc(a,b) / √(n(a)·n(b)) — pure integer counts under one sqrt, so
  * cross-engine parity needs only a final 9-dp round.
  *
  * Scale shape: pair generation is the q120 orderkey-keyed self-join
  * (per-order fan-out is the basket size, bounded); cooc and the
  * per-item marginals are map-side-combined counts; the marginal join
  * back is item-keyed. The min-support filter (cooc ≥ 3) prunes the
  * long random tail BEFORE the top-k, and the k winners come from
  * TakeOrderedAndProject. */
object ItemSim {

  private val MinSupport = 3
  private val TopK = 50

  /** Q134: top-50 part pairs by basket cosine, support ≥ 3. */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_partkey")).distinct()
    val cooc = li.select(col("k"), col("l_partkey").as("a"))
      .join(li.select(col("k"), col("l_partkey").as("b")), "k")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cooc"))
      .where(col("cooc") >= MinSupport)
    val marg = li.groupBy(col("l_partkey").as("id"))
      .agg(count(lit(1)).as("n"))
    cooc
      .join(marg.select(col("id").as("a"), col("n").as("na")), Seq("a"))
      .join(marg.select(col("id").as("b"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("cooc"),
        round(col("cooc").cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")), 9).as("sim"))
      .orderBy(col("sim").desc_nulls_last, col("a").asc_nulls_last,
        col("b").asc_nulls_last)
      .limit(TopK)
  }

  private val q134Sql =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS k, l_partkey FROM lineitem),
       |cooc AS (
       |  SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS cooc
       |  FROM li a JOIN li b ON a.k = b.k
       |  WHERE a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinSupport),
       |marg AS (SELECT l_partkey AS id, COUNT(*) AS n FROM li GROUP BY 1)
       |SELECT a, b, cooc,
       |  ROUND(CAST(cooc AS DOUBLE) /
       |    sqrt(CAST(ma.n AS DOUBLE) * CAST(mb.n AS DOUBLE)), 9) AS sim
       |FROM cooc JOIN marg ma ON a = ma.id JOIN marg mb ON b = mb.id
       |ORDER BY sim DESC NULLS LAST, a ASC NULLS LAST, b ASC NULLS LAST
       |LIMIT $TopK""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q134_item_sim", q134, Some(q134Sql)))
}
