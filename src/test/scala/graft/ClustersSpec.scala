package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (q55): label propagation must find transitive
  * closures — chains, triangles, isolated pairs — and refuse to return
  * a partial clustering when the round budget is too small.
  */
class ClustersSpec extends AnyFunSuite {
  import SparkTestSession._

  private def cc(pairs: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    val edges = pairs.toDF("src", "dst")
    operators.Clusters.connectedComponents(edges, maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, triangle and isolated pair all collapse to min-id components") {
    // chain 1-2-3-4-5, triangle 10-11-12 (with all three edges), pair 20-21
    val labels = cc(Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)))
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("non-convergence within maxIter throws instead of returning partial labels") {
    // propagation needs ~4 rounds to push label 1 down a 5-node chain
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assertThrows[IllegalStateException](cc(chain, maxIter = 1))
  }

  test("q55 collapses the fixture's planted triangle and keeps one doc per cluster") {
    val out = SparkEntry.queries("q55_dedup_clusters")(spark, "/root/testdata/sf0.01")
    val tri = out.where(col("doc_id").isin(45L, 267L, 413L))
      .select(col("doc_id"), col("cluster"), col("keep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(tri == Set((45L, 45L, true), (267L, 45L, false), (413L, 45L, false)))
    // exactly one keeper per cluster, and every doc is labeled
    val byCluster = out.groupBy(col("cluster"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("keepers"))
    assert(byCluster.where(col("keepers") =!= 1L).isEmpty)
  }
}
