package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** The round-8 TPC-H completion set (Q4, Q6, Q8–Q17, Q19, Q20, Q22 —
  * operators/TpchFull.scala). Correctness is the driver's DuckDB gate;
  * here: the plan-shape claims each query's scaladoc makes, and the
  * q115 disjunctive-pushdown rewrite proven equal to the naive form. */
class TpchFullSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def executedPlan(name: String): String = {
    val df = run(name)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("all 22 TPC-H query shapes are registered") {
    val tpch = Registry.all.map(_.name).filter(_.contains("_tpch_q"))
    val nums = tpch.map(_.split("_tpch_q").last.toInt).toSet
    assert(nums == (1 to 22).toSet, s"missing TPC-H queries: ${(1 to 22).toSet -- nums}")
  }

  test("q103 (Q4): EXISTS decorrelates to one semi join, no re-execution") {
    val plan = executedPlan("q103_tpch_q4")
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
    assert(run("q103_tpch_q4").count() > 0)
  }

  test("q104 (Q6): predicates reach the parquet scan") {
    val df = run("q104_tpch_q6")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") &&
      formatted.contains("l_shipdate"), s"filters not pushed:\n$formatted")
  }

  test("q107 (Q10): top-20 is a bounded TakeOrderedAndProject, not a global sort") {
    val plan = executedPlan("q107_tpch_q10")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("q110 (Q13): every customer survives the outer join (Σcustdist = |customer|)") {
    // the Q13 trap is the order-side predicate in WHERE, which turns
    // the outer join inner and DROPS customers whose orders all fail
    // the predicate; the distribution must still account for every
    // customer (at sf0.001 every customer happens to have a qualifying
    // order, so the c_count=0 bucket itself may legitimately be empty)
    val rows = run("q110_tpch_q13").collect()
    val total = Tables.t(spark, sf, "customer").count()
    assert(rows.map(_.getLong(1)).sum == total,
      "left-outer join lost customers (order-side predicate must live " +
        "in the join condition, not WHERE)")
  }

  test("q115 (Q19): explicit per-side pushdown equals the naive disjunctive form") {
    Tables.registerViews(spark, sf)
    val naive = spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin).collect()
    val rewritten = run("q115_tpch_q19").collect()
    assert(rewritten.map(_.getDouble(0)).toSeq == naive.map(_.getDouble(0)).toSeq,
      "pushdown rewrite changed the answer")
  }

  test("q115 (Q19): stays an equi hash/merge join — never a nested loop") {
    val plan = executedPlan("q115_tpch_q19")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"disjunctive predicate degraded the join:\n$plan")
  }

  test("q114 (Q17): correlated scalar AVG decorrelates to one keyed aggregate") {
    val plan = executedPlan("q114_tpch_q17")
    // decorrelation leaves a partkey-keyed aggregate feeding a join —
    // NOT a per-outer-row subquery (which would appear as a subquery
    // wrapper re-executed per row)
    assert(plan.contains("HashAggregate") &&
      (plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin")),
      s"expected decorrelated agg+join:\n$plan")
  }

  test("q117 (Q22): anti join for NOT EXISTS; exact-arithmetic filter path") {
    val plan = executedPlan("q117_tpch_q22")
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
    // threshold comparison happens in decimal (bal × n > Σbal): no
    // double division anywhere before the output projection
    val rows = run("q117_tpch_q22").collect()
    assert(rows.nonEmpty, "rich-no-order customer set is empty at sf0.001")
  }

  test("q116 (Q20): group-by and window share the one explicit partkey shuffle") {
    val df = run("q116_tpch_q20")
    df.collect()
    // the explicit repartition(partkey) satisfies BOTH the aggregate's
    // ClusteredDistribution(partkey, suppkey) (subset rule) and the
    // window's partitionBy(partkey) — so the only hash exchanges in
    // the whole plan are that repartition, the suppkey distinct, and
    // (at most) a semi-join shuffle. The naive SQL form pays separate
    // (partkey, suppkey) and partkey shuffles on the hot path.
    // AdaptiveSparkPlan.toString prints Final AND Initial plans —
    // count exchanges in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 3, s"unexpected shuffle count $shuffles:\n$plan")
    assert(plan.contains("Window"), s"window collapsed out of the plan:\n$plan")
  }
}
