package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale path of ranking top-k (q18): Spark's rank-limit pushdown
  * (WindowGroupLimit, SPARK-37099) must keep only k rows per key on the
  * map side BEFORE the window exchange — the two-phase top-k the 100 TB
  * design calls for, with no custom operator needed.
  */
class WindowLimitSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q18 rank filter pushes a WindowGroupLimit below the exchange") {
    val plan = SparkEntry.queries("q18_window_rank")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing:\n$plan")
    // partial mode runs before the exchange (map-side top-k)
    assert(plan.contains("Partial"),
      s"expected a partial (map-side) group limit:\n$plan")
  }

  test("q91 per-source quota rides the same map-side group limit") {
    val plan = SparkEntry.queries("q91_source_quota")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing:\n$plan")
    assert(plan.contains("Partial"),
      s"expected a partial (map-side) group limit:\n$plan")
  }
}
