package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HRW (rendezvous) sharding properties — the minimal-movement law the
  * operator exists for, asserted on real assignments rather than argued:
  * growing 8→9 shards, a doc either keeps its shard or moves INTO the
  * new shard; old shards never trade docs. */
class ShardingSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val assigned = Tables.t(spark, sf, "documents")
    .select(col("doc_id"),
      operators.Sharding.hrwShard(col("doc_id"), 8).as("s8"),
      operators.Sharding.hrwShard(col("doc_id"), 9).as("s9"))
    .cache()

  test("rebalance 8→9 moves docs only into the new shard") {
    val badMoves = assigned
      .where(col("s8") =!= col("s9") && col("s9") =!= 8).count()
    assert(badMoves == 0,
      s"$badMoves docs moved between pre-existing shards — HRW law broken")
  }

  test("moved fraction is near 1/9, not near the mod-N (N-1)/N") {
    val total = assigned.count().toDouble
    val moved = assigned.where(col("s8") =!= col("s9")).count().toDouble
    val frac = moved / total
    assert(frac > 0.04 && frac < 0.25,
      f"moved fraction $frac%.3f outside the ~1/9 band")
  }

  test("8-shard populations are balanced (no shard twice the mean)") {
    val counts = assigned.groupBy(col("s8")).count()
      .collect().map(_.getLong(1))
    assert(counts.length == 8, s"expected 8 populated shards, got ${counts.length}")
    val mean = counts.sum.toDouble / counts.length
    assert(counts.forall(c => c > mean * 0.4 && c < mean * 2.0),
      s"imbalanced shards: ${counts.mkString(",")} (mean $mean)")
  }

  test("weighted HRW: doubling one shard's weight moves docs only INTO that shard") {
    val uni = Seq.fill(8)(1)
    val wtd = 2 +: Seq.fill(7)(1)
    val a = Tables.t(spark, sf, "documents").select(
      operators.Sharding.hrwShardWeighted(col("doc_id"), uni).as("su"),
      operators.Sharding.hrwShardWeighted(col("doc_id"), wtd).as("sw"))
    val badMoves = a.where(col("su") =!= col("sw") && col("sw") =!= 0).count()
    assert(badMoves == 0,
      s"$badMoves docs moved to a shard whose weight did not change")
  }

  test("weighted HRW: shares are proportional to weights (2-weight shard ≈ 2/9)") {
    val wtd = 2 +: Seq.fill(7)(1)
    val counts = Tables.t(spark, sf, "documents")
      .select(operators.Sharding.hrwShardWeighted(col("doc_id"), wtd).as("s"))
      .groupBy(col("s")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val share0 = counts(0) / total
    assert(share0 > 1.4 / 9 && share0 < 2.8 / 9,
      f"double-weight shard holds $share0%.3f, expected ≈ ${2.0 / 9}%.3f")
    (1 until 8).foreach { i =>
      val sh = counts.getOrElse(i, 0L) / total
      assert(sh > 0.5 / 9 && sh < 1.8 / 9, f"unit shard $i holds $sh%.3f ≉ 1/9")
    }
  }

  test("costWeights: a 2×-cost shard's share roughly halves (the load-aware law)") {
    val weights = operators.Sharding.costWeights(2.0 +: Seq.fill(7)(1.0))
    assert(weights.head < weights(1), "slow shard must get fewer virtual nodes")
    val counts = Tables.t(spark, sf, "documents")
      .select(operators.Sharding.hrwShardWeighted(col("doc_id"), weights).as("s"))
      .groupBy(col("s")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val ratio = (counts(0) / total) / (1.0 / 8)
    assert(ratio > 0.3 && ratio < 0.8,
      f"2×-cost shard share ratio vs uniform is $ratio%.2f, expected ≈ 0.53")
  }

  test("q146 registry output is self-consistent (weighted rebalance differential)") {
    val rows = SparkEntry.queries("q146_weighted_shards")(spark, sf).collect()
    val total = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_uniform")).sum == total)
    assert(rows.map(_.getAs[Long]("n_weighted")).sum == total)
    rows.foreach { r =>
      val shard = r.getAs[Int]("shard")
      val movedIn = r.getAs[Long]("moved_in")
      if (shard != 0) assert(movedIn == 0,
        s"shard $shard gained $movedIn docs — only the upweighted shard may gain")
      else assert(movedIn == r.getAs[Long]("n_weighted") - r.getAs[Long]("n_uniform"),
        "shard 0's gain must equal its population delta (it never loses)")
    }
  }

  test("q96 registry output is self-consistent") {
    val rows = SparkEntry.queries("q96_hrw_shards")(spark, sf).collect()
    val total = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n8")).sum == total)
    assert(rows.map(_.getAs[Long]("n9")).sum == total)
    rows.foreach { r =>
      val shard = r.getAs[Int]("shard")
      val movedIn = r.getAs[Long]("moved_in")
      if (shard < 8) assert(movedIn == 0,
        s"shard $shard gained $movedIn docs — only the new shard may gain")
      else assert(movedIn == r.getAs[Long]("n9"),
        "every doc on the new shard must be a mover")
    }
  }
}
