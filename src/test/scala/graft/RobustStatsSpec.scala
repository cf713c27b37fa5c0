package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q123 (mergeable histogram quantile sketch) and q124 (order-statistic
  * winsorization). Correctness vs the DuckDB oracle is the driver's
  * gate; here: the MERGE law (the property that makes the sketch a
  * sketch), the error bound vs exact order statistics, and the capping
  * laws. */
class RobustStatsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q123: slice sketches merge to the whole-corpus sketch (counts add, ranges union)") {
    val base = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    // sketch = (lo, hi, n) + bin counts over a FIXED range; merging
    // slices that share the range is pure count addition — prove the
    // registry entry's two-pass construction equals slice-merge by
    // computing global range first, then per-slice bin counts
    val rng = base.agg(min(col("x")).as("lo"), max(col("x")).as("hi")).collect()(0)
    val (lo, hi) = (rng.getDouble(0), rng.getDouble(1))
    val w = (hi - lo) / 256.0
    def counts(slice: org.apache.spark.sql.DataFrame): Map[(String, Int), Long] =
      slice.withColumn("bin",
          least(floor((col("x") - lit(lo)) / lit(w)).cast("int"), lit(255)))
        .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = counts(base)
    val sliceA = counts(base.where(col("x") < lit((lo + hi) / 2)))
    val sliceB = counts(base.where(col("x") >= lit((lo + hi) / 2)))
    val merged = (sliceA.keySet ++ sliceB.keySet).map(k =>
      k -> (sliceA.getOrElse(k, 0L) + sliceB.getOrElse(k, 0L))).toMap
    assert(merged == whole, "bin counts are not additive across slices")
  }

  test("q123: estimates sit within one bin width of the exact order statistics") {
    val est = SparkEntry.queries("q123_hist_quantiles")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val base = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    val byG = base.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byG.foreach { case (g, xs) =>
      val binW = (xs.last - xs.head) / 256.0
      Seq(0.5, 0.9, 0.99).foreach { q =>
        val exact = xs(math.min(xs.length - 1,
          math.max(0, math.ceil(q * xs.length).toInt - 1)))
        val e = est((g, q))
        assert(math.abs(e - exact) <= binW + 1e-6,
          s"g=$g q=$q est=$e exact=$exact binW=$binW")
      }
    }
  }

  test("q124: capped sum bounded by raw sum; clamp counts match the tails") {
    val rows = SparkEntry.queries("q124_winsorize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nLo, nHi) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(nLo < n * 0.06 + 1, s"low clamp too wide: $nLo of $n")
      assert(nHi < n * 0.06 + 1, s"high clamp too wide: $nHi of $n")
      assert(nLo + nHi > 0, "winsorization clamped nothing — degenerate fixture")
    }
  }

  private def base = Tables.t(spark, sf, "lineitem")
    .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))

  test("q124 differential: sketch caps sit within one bin width of the exact order statistics") {
    // the r9 default derives (p_lo, p_hi) from the mergeable histogram;
    // the exact-order-statistic twin survives as winsorizeExact — the
    // two must agree to one bin width (the sketch's error bound)
    val exact = graft.operators.RobustStats.winsorizeExact(base)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val sketch = graft.operators.RobustStats.winsorizeSketchCaps(spark, base)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val binw = base.groupBy(col("g"))
      .agg(((max(col("x")) - min(col("x"))) / 256.0).as("binw"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == sketch.keySet && exact.nonEmpty)
    exact.foreach { case (g, (eLo, eHi)) =>
      val (sLo, sHi) = sketch(g)
      val tol = binw(g) + 1e-6
      assert(math.abs(sLo - eLo) <= tol, s"g=$g p_lo sketch=$sLo exact=$eLo binw=${binw(g)}")
      assert(math.abs(sHi - eHi) <= tol, s"g=$g p_hi sketch=$sHi exact=$eHi binw=${binw(g)}")
    }
  }

  test("q126 differential: sketch-CDF agrees with percent_rank to the boundary-bin mass") {
    val sketch = graft.operators.RobustStats.quantileTransformSketch(spark, base)
      .select(col("g"), col("x"), col("pr").as("pr_s"))
    val exact = graft.operators.RobustStats.quantileTransformExact(base)
      .select(col("g"), col("x"), col("pr").as("pr_e"))
      .groupBy(col("g"), col("x")).agg(min(col("pr_e")).as("pr_e"))
    val joined = sketch.groupBy(col("g"), col("x")).agg(min(col("pr_s")).as("pr_s"))
      .join(exact, Seq("g", "x"))
      .select(abs(col("pr_s") - col("pr_e")).as("d"))
      .agg(max(col("d")).as("dmax")).collect()(0).getDouble(0)
    // per-row CDF error ≤ (boundary bin mass)/n plus rank-vs-count off-
    // by-one; ~1/256 of mass per bin on this near-uniform fixture
    assert(joined <= 0.02, s"sketch CDF deviates from percent_rank by $joined")
  }
}
