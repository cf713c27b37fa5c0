package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pruning, TableDiff}

/** Dynamic partition pruning (q77) + table diff (q78): plan evidence
  * for the runtime-pruned scan, and hand-checked diff semantics. */
class PruningSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("q77 fact scan carries a dynamicpruning partition filter") {
    val fact = spark.read.parquet(Pruning.yearPartitionedOrders(spark, sf))
    val dim = Tables.t(spark, sf, "lineitem")
      .where(col("l_returnflag") === "R")
      .select(year(col("l_shipdate")).as("o_year")).distinct()
    val joined = fact.join(dim, Seq("o_year"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    val physical = joined.queryExecution.executedPlan.toString
    assert(optimized.contains("dynamicpruning") ||
      physical.contains("dynamicpruning"),
      s"no dynamicpruning filter injected:\n$physical")
  }

  test("q77 result matches the unpartitioned join") {
    val got = SparkEntry.queries("q77_dpp_join")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val plain = Tables.t(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .join(Tables.t(spark, sf, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(year(col("l_shipdate")).cast("long").as("o_year")).distinct(),
        Seq("o_year"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), Canon.dsum(col("o_totalprice"), 2).as("total_price"))
      .orderBy(col("o_year").asc_nulls_last)
      .collect().map(_.toSeq).toSeq
    assert(got === plain)
  }

  test("q80 fact side applies a runtime bloom filter before its shuffle") {
    val df = Pruning.q80(spark, sf)
    df.collect()
    val formatted = Metrics.executedPlanString(df.queryExecution)
    assert(formatted.contains("might_contain"),
      s"no runtime bloom filter injected:\n$formatted")
    assert(formatted.contains("bloom_filter_agg"),
      s"no bloom_filter_agg build side:\n$formatted")
  }

  test("q80 result matches the plain join (bloom filter drops no survivor)") {
    val got = Pruning.q80(spark, sf).collect().map(_.toSeq).toSeq
    val plain = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "orders")
        .where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        Canon.dsum(col("l_extendedprice"), 2).as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_last)
      .collect().map(_.toSeq).toSeq
    assert(got === plain)
  }

  test("q80's cloned-session confs do not leak into the shared session") {
    Pruning.q80(spark, sf).collect()
    assert(spark.conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .forall(_ != "0"))
  }

  test("tableDiff classifies added/removed/changed and drops unchanged") {
    val base = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"),
      (4L, null.asInstanceOf[String], "w")).toDF("id", "t", "u")
    val cur = Seq((1L, "a", "x"), (2L, "B", "y"), (5L, "e", "v"),
      (4L, "", "w")).toDF("id", "t", "u")
    val out = TableDiff.tableDiff(base, cur, Seq("id"), Seq("t", "u"))
      .orderBy("id").as[(Long, String)].collect()
    // 1 unchanged (absent), 2 changed, 3 removed, 4 NULL->'' must be
    // CHANGED (null-tagging), 5 added
    assert(out === Array((2L, "changed"), (3L, "removed"),
      (4L, "changed"), (5L, "added")))
  }

  test("diff plan is one full-outer join, fingerprints map-side") {
    val docs = Tables.t(spark, sf, "documents")
    val plan = TableDiff.tableDiff(docs, docs, Seq("doc_id"), Seq("text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"expected full-outer join:\n$plan")
    // exactly one join in the plan
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size === 1)
  }
}
