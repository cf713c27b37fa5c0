package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q121 (standardization stats) and q122 (entity canonicalization).
  * Correctness is the driver's DuckDB gate; here: the algebraic and
  * election laws on small frames, and the plan claims. */
class FeatureCanonSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q121: 64 dims, sigma positive, moments match a local computation") {
    val rows = SparkEntry.queries("q121_standardize")(spark, sf).collect()
    assert(rows.length == 64)
    assert(rows.forall(_.getDouble(2) > 0), "degenerate sigma")
    // dim 1 cross-check against a driver-side exact computation
    val xs = Tables.t(spark, sf, "embeddings")
      .select(element_at(col("embedding"), 1).cast("double"))
      .collect().map(_.getDouble(0))
    val n = xs.length.toDouble
    val mu = xs.map(BigDecimal(_)).sum.toDouble / n
    val got = rows.find(_.getLong(0) == 1L).get
    assert(math.abs(got.getDouble(1) - mu) < 1e-8,
      s"dim-1 mean ${got.getDouble(1)} != $mu")
  }

  test("q122: canonical member belongs to its cluster and wins the tie-break") {
    val canon = SparkEntry.queries("q122_entity_canonical")(spark, sf).collect()
    val assign = SparkEntry.queries("q55_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chars = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon.nonEmpty, "no multi-member clusters at this sf")
    canon.foreach { r =>
      val (cluster, cid, nMembers) = (r.getLong(0), r.getLong(1), r.getLong(3))
      val members = assign.filter(_._2 == cluster).keys.toSeq
      assert(members.contains(cid), s"canonical $cid not in cluster $cluster")
      assert(members.size.toLong == nMembers)
      // election law: max n_chars, tie -> min doc_id
      val best = members.maxBy(m => (chars(m), -m))
      assert(cid == best, s"cluster $cluster elected $cid, expected $best")
    }
  }

  test("q122: election and merge fold in ONE cluster-keyed aggregation") {
    val df = SparkEntry.queries("q122_entity_canonical")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // max_by election = aggregate, not window: exactly one
    // cluster-keyed exchange, no rank window, no member self-join
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("cluster"))
    assert(exchanges == 1, s"cluster-keyed exchanges = $exchanges:\n$plan")
    assert(!plan.contains("Window ["), s"unexpected window in plan:\n$plan")
  }
}
