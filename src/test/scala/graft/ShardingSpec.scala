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
