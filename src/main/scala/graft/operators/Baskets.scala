package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9: market-basket association mining — pairwise support and
  * LIFT over co-purchased brands (the first level of Apriori, which in
  * practice is the level retail/recommendation pipelines actually ship;
  * q134's item-item cosine ranks similarity, lift tests statistical
  * DEPENDENCE: lift > 1 ⇔ the pair co-occurs more than independence
  * predicts).
  *
  * Spark-first shape: reduce baskets to per-order DISTINCT item sets
  * in ONE order-keyed aggregation (bounded at |brands| items per order
  * — the cardinality cap that makes pair enumeration safe at 100 TB),
  * enumerate the ≤ C(|brands|,2) pairs per order map-side from the
  * sorted set, and a pair-keyed count + two joins of the
  * |brands|-sized marginal table finish it. No all-pairs anything and
  * no corpus self-join: the corpus crosses the wire once.
  *
  * Determinism/oracle: supports are exact integers; lift is ONE double
  * division of integer products — identical IEEE ops in DuckDB; output
  * ordered by the pair key, never by the float. */
object Baskets {

  private val MinSupport = 20L

  /** PUBLIC API — pairwise lift over (basket_id, item) rows (dupes
    * allowed; projected distinct internally): (item_a, item_b, n_a,
    * n_b, n_ab, lift) for pairs with n_ab ≥ minSupport. */
  def pairLift(baskets: DataFrame, minSupport: Long = MinSupport): DataFrame = {
    // r17 (guide §2.4 — remove shuffles outright): ONE basket-keyed
    // exchange with map-side partial collect_set replaces the r16
    // shape's distinct exchange PLUS the two self-join exchanges of the
    // corpus-sized (basket, item) frame; basket count, marginals and
    // the pair stream all derive from the per-basket item sets, so the
    // shared groupBy exchange is planned once (ReusedExchange) and the
    // corpus crosses the wire exactly once. Pair enumeration happens
    // map-side on the sorted set (i < j positions ≡ item_a < item_b in
    // the same binary string order the join predicate used) and is
    // partially aggregated before the pair-keyed exchange.
    // Null-item edge kept bit-compatible: collect_set drops nulls, but
    // the groupBy row survives (empty set), so a null-only basket still
    // counts in n_baskets while producing no pairs — exactly what
    // `item_a < item_b` (null-rejecting) produced before; the null
    // marginal row never reached the output (pair joins are non-null).
    val ba = baskets.groupBy(col("basket_id"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
    val nBaskets = ba.agg(count(lit(1)).as("n_baskets"))
    val marg = ba.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = ba.select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items) - i - 1),
          |    y -> struct(x AS item_a, y AS item_b))))""".stripMargin)).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    // r16: the item marginals are |items|-sized — bounded for q148
    // (items = 25 brands) but UNBOUNDED for general callers of this
    // public API (items = partkey ⇒ 2·10⁷ rows at sf100). Bare
    // broadcast() is honored at any size (the q87 lesson), so the
    // hints are gone: AQE broadcasts the marginals from MEASURED
    // post-shuffle sizes whenever they genuinely fit — identical plan
    // at fixture scale, shuffle-join fallback past it.
    pairs
      .join(marg.select(col("item").as("item_a"), col("n_item").as("n_a")),
        "item_a")
      .join(marg.select(col("item").as("item_b"), col("n_item").as("n_b")),
        "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"), col("n_ab"),
        round((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 9).as("lift"))
      .orderBy(col("item_a").asc_nulls_last, col("item_b").asc_nulls_last)
  }

  /** Q148: brand-pair lift over orders (baskets = orders, items =
    * distinct part brands on the order's lines). */
  private def q148(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey").as("basket_id"), col("l_partkey"))
    val baskets = li.join(
      Tables.t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
      col("l_partkey") === col("p_partkey"))
      .select(col("basket_id"), col("p_brand").as("item"))
    pairLift(baskets)
  }

  private val q148Sql =
    s"""WITH ob AS (
       |  SELECT DISTINCT l_orderkey AS basket_id, p_brand AS item
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |nb AS (SELECT COUNT(DISTINCT basket_id) AS n_baskets FROM ob),
       |marg AS (SELECT item, COUNT(*) AS n_item FROM ob GROUP BY item),
       |pairs AS (
       |  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_ab
       |  FROM ob a JOIN ob b ON a.basket_id = b.basket_id AND a.item < b.item
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $MinSupport)
       |SELECT item_a, item_b, ma.n_item AS n_a, mb.n_item AS n_b, n_ab,
       |  ROUND(CAST(n_ab * nb.n_baskets AS DOUBLE) /
       |    CAST(ma.n_item * mb.n_item AS DOUBLE), 9) AS lift
       |FROM pairs
       |  JOIN marg ma ON pairs.item_a = ma.item
       |  JOIN marg mb ON pairs.item_b = mb.item
       |  CROSS JOIN nb
       |ORDER BY item_a ASC NULLS LAST, item_b ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q148_basket_lift", q148, Some(q148Sql)))
}
