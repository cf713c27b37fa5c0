package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling against a genSkewData-shaped fixture (~90 % of
  * rows on one hot key, mirroring the reference's skew stress:
  * celeborn toolkit/scripts/genSkewData.scala:21-36 + SkewJoinSuite) —
  * the splitter must fire (skew=true in the final adaptive plan) and
  * the result must equal the unskewed computation.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("AQE splits the hot partition and keeps the join exact") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // the groupBy downstream reuses the join's partitioning, which
      // normally vetoes the split (it would add a shuffle); force it —
      // the realistic choice when one straggler dominates the stage
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~91% of fact rows share key 0; payload pads bytes per row
      val fact = spark.range(0, 110000)
        .select(
          when(col("id") < 100000, 0L).otherwise(col("id") % 997).as("k"),
          concat(lit("x" * 64), col("id").cast("string")).as("payload"))
      val dim = spark.range(0, 997).select(col("id").as("k"),
        (col("id") * 7).as("v"))
      // aggregate over payload too so column pruning cannot drop it —
      // the hot partition must actually carry the wide rows
      val joined = fact.hint("merge").join(dim, "k")
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          sum(length(col("payload"))).as("bytes"))
      val rows = joined.collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // expected, from the same definition computed locally
      val keys = (0L until 110000L).map(id => if (id < 100000) 0L else id % 997)
      val expected = keys.groupBy(identity).map { case (k, g) =>
        k -> ((g.size.toLong, g.size.toLong * k * 7))
      }
      assert(rows == expected,
        s"join result diverged; hot=${rows.get(0L)} vs ${expected(0L)}")
      () // bytes column only forces the payload through the shuffle
      // the splitter actually fired
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not trigger:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces tiny shuffle partitions (split's counterpart, §2A row 11)") {
    // the reference splits oversized partition files and drains/merges
    // small ones (PartitionSplit SOFT/HARD); Spark's runtime counterpart
    // in the shrink direction is AQE partition coalescing — a tiny
    // aggregate shuffled over the session's full partition count must
    // execute with far fewer post-shuffle partitions
    val confs = Map(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = Tables.t(spark, sf, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val rows = agg.collect()
      assert(rows.nonEmpty)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"AQE did not coalesce the tiny shuffle:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
