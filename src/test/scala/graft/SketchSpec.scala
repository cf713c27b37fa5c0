package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL sketch-profile semantics (q90): estimate accuracy against the
  * exact twin, and the property the sketches exist for — profiles over
  * arbitrary disjoint slices merge into the same rollup a direct scan
  * produces, without rescanning. */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  private def profile(): Map[String, Long] =
    SparkEntry.queries("q90_hll_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("hll estimates sit within the lgK=12 error envelope of the exact counts") {
    val est = profile()
    val exact = SparkEntry.queries("q90_distinct_exact")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    // datasketches HLL at lgK=12: relative standard error ~1.04/sqrt(2^12)
    // = 1.6%; 5% is >3 sigma
    for ((k, e) <- exact) {
      val rel = math.abs(est(k) - e).toDouble / e
      assert(rel < 0.05, s"$k: est=${est(k)} exact=$e rel=$rel")
    }
  }

  test("sketches from disjoint slices union to the direct whole-corpus estimate") {
    val docs = Tables.t(spark, sf, "documents")
    val tok = docs.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("tok"))
    // direct: one sketch over every token
    val direct = tok.agg(hll_sketch_estimate(hll_sketch_agg(col("tok"), 12)))
      .head().getLong(0)
    // sliced: an ARBITRARY 7-way split (unrelated to source), sketch per
    // slice, union — must agree with direct because HLL union at equal
    // lgK is lossless
    val sliced = tok.withColumn("slice", col("doc_id") % 7)
      .groupBy(col("slice")).agg(hll_sketch_agg(col("tok"), 12).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    assert(sliced == direct, s"sliced=$sliced direct=$direct")
    // and the registry's per-source union row is that same rollup
    assert(profile()("__ALL__") == direct)
  }

  test("hll profile is deterministic across invocations") {
    assert(profile() == profile())
  }

  test("cms heavy-hitter estimates obey the one-sided error bound") {
    val est = SparkEntry.queries("q92_heavy_hitters")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = SparkEntry.queries("q92_hitters_exact")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a top token can be absent from a source; the estimate set probes
    // every (source, top-token) pair, the exact twin only realized ones
    assert(exact.keySet.subsetOf(est.keySet))
    val tokensPerSource = Tables.t(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k @ (src, _), e) <- est) {
      val t = exact.getOrElse(k, 0L)
      assert(e >= t, s"$k: CMS underestimated $e < $t")
      assert(e <= t + (0.001 * tokensPerSource(src)).ceil.toLong,
        s"$k: est=$e exceeds eps bound over true=$t")
    }
  }

  test("cms sketches are partitioning-invariant (mergeInPlace is exact)") {
    import graft.operators.Sketches
    val docs = Tables.t(spark, sf, "documents")
    val a = Sketches.heavyHitters(spark, docs.repartition(7)).collect().toSeq
    val b = Sketches.heavyHitters(spark, docs.repartition(2)).collect().toSeq
    assert(a == b)
  }
}
