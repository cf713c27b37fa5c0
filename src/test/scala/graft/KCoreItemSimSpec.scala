package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q133 (k-core peeling) and q134 (item-item basket cosine). */
class KCoreItemSimSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("q133: trajectory is non-increasing and the fixed rounds converge") {
    val rows = SparkEntry.queries("q133_kcore")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 8)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"edges grew between rounds: $a -> $b")
    }
    val last = rows.takeRight(2)
    assert(last(0)._3 == last(1)._3,
      s"peel did not converge within the fixed rounds: ${rows.mkString(",")}")
  }

  test("kcoreEdges: the surviving subgraph really is a k-core (min degree >= k)") {
    // adversarial shape: a 5-clique (4-core) with pendant chains that
    // only multi-round peeling removes (chain end has degree 1, its
    // neighbour only drops below k after the end is gone)
    val clique = for (a <- 0 to 4; b <- 0 to 4 if a < b) yield (a.toLong, b.toLong)
    val chain = Seq((0L, 10L), (10L, 11L), (11L, 12L))
    val edges = (clique ++ chain).toDF("src", "dst")
    val core = graft.operators.KCore.kcoreEdges(edges, k = 4, rounds = 10)
    val got = core.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == clique.toSet, s"4-core must be exactly the clique, got $got")
    val deg = core.select(col("u").as("id")).unionAll(core.select(col("v").as("id")))
      .groupBy("id").count().collect().map(_.getLong(1))
    assert(deg.forall(_ >= 4))
  }

  test("q134: similarity is a valid basket cosine (bounds + support law)") {
    val rows = SparkEntry.queries("q134_item_sim")(spark, sf).collect()
    assert(rows.nonEmpty)
    val marg = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b, cooc, sim) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(sim > 0 && sim <= 1.0, s"cosine out of range: $r")
      assert(cooc >= 3)
      assert(cooc <= math.min(marg(a), marg(b)),
        s"cooc exceeds a marginal: $r")
    }
  }
}
