package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup against a persisted MinHash index: the probe must
  * find exactly the cross-split slice of the exhaustive exact-Jaccard
  * pairs (no banding miss on this data), and it must touch the base
  * corpus only through the index tables — the property that makes the
  * operator O(delta) instead of O(corpus) per batch. */
class IncrementalDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private def splitTrain() =
    expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) " +
      "as bigint) % 10 < 8")

  test("probe equals the cross-split slice of exhaustive exact pairs") {
    val docs = Tables.t(spark, sf, "documents")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_incdedup_spec").toString
    operators.IncrementalDedup.buildIndex(
      docs.where(splitTrain()), idx)
    val got = operators.IncrementalDedup
      .probeIndex(spark, docs.where(!splitTrain()), idx)
      .select("delta_id", "base_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // exhaustive: corpus-wide exact Jaccard at the same threshold,
    // sliced to cross-split pairs (independent of MinHash banding)
    val isBase = docs.select(col("doc_id"),
      splitTrain().as("b")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val want = operators.Dedup.ngramJaccardPairs(docs, threshold = 0.8)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => isBase(a) != isBase(b) }
      .map { case (a, b) => if (isBase(a)) (b, a) else (a, b) }.toSet

    assert(got == want,
      s"missed=${want.diff(got)} spurious=${got.diff(want)}")
  }

  test("probe plan reads the base side from the index, not the corpus") {
    val docs = Tables.t(spark, sf, "documents")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_incdedup_plan").toString
    operators.IncrementalDedup.buildIndex(
      docs.where(splitTrain()), idx)
    val probe = operators.IncrementalDedup
      .probeIndex(spark, docs.where(!splitTrain()), idx)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains(idx) || plan.contains(new java.io.File(idx).getName),
      s"probe plan never scans the index dir:\n$plan")
    // determinism across repeated probes of the same persisted index
    val a = probe.collect().toSeq
    val b = operators.IncrementalDedup
      .probeIndex(spark, docs.where(!splitTrain()), idx)
      .collect().toSeq
    assert(a == b, "re-probing the same index diverged")
  }
}
