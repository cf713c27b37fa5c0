package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form and robustness laws for q171 (Mann–Kendall +
  * Theil–Sen):
  *  - a linear-in-date series (gaps included — slopes use real date
  *    differences) reads S = n(n−1)/2, zero tie term, and the slope
  *    EXACTLY, since every pairwise slope equals b;
  *  - a constant series reads S = 0 with zero variance (z undefined);
  *  - one planted outlier day moves the Theil–Sen slope NOT AT ALL
  *    (exact 3.0) and S by exactly the 2·(n−pos) flipped pairs, while
  *    the least-squares slope on the same data is dragged off by
  *    orders of magnitude — the robustness contrast q147 cannot offer;
  *  - the [1,1,2] tie case reproduces the hand-computed tie-corrected
  *    variance 48/18 and z = 1/√(48/18);
  *  - a decreasing series mirrors to S = −n(n−1)/2;
  *  - single-day groups emit nothing (no pairs), by contract.
  */
class TrendSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def day(d: Int) = java.sql.Date.valueOf(f"2024-03-$d%02d")

  test("linear-in-date series (with gaps): exact slope, S = n(n-1)/2") {
    val days = Seq(1, 2, 3, 5, 8, 13, 21, 28) // gapped on purpose
    val daily = days.map(d => ("lin", day(d), 40L + 3L * d)).toDF("g", "day", "x")
    val r = operators.Trend.mannKendall(daily).collect()
    assert(r.length == 1)
    val row = r.head
    val n = days.size.toLong
    assert(row.getLong(1) == n)
    assert(row.getLong(2) == n * (n - 1) / 2)
    assert(row.getLong(3) == n * (n - 1) / 2, "strictly increasing: every sign +1")
    // no ties: var = n(n-1)(2n+5)/18, reported at 6 dp
    assert(row.getDouble(4) ==
      math.rint(n * (n - 1) * (2 * n + 5) / 18.0 * 1e6) / 1e6)
    assert(row.getDouble(6) == 3.0, s"every pairwise slope is exactly b: $row")
    assert(row.getDouble(5) > 0)
  }

  test("constant series: S = 0, all-tied variance collapses to 0, z undefined") {
    val daily = (1 to 12).map(d => ("c", day(d), 9L)).toDF("g", "day", "x")
    val row = operators.Trend.mannKendall(daily).collect().head
    assert(row.getLong(3) == 0L)
    assert(row.getDouble(4) == 0.0)
    assert(row.isNullAt(5), "z must be NULL at zero variance")
    assert(row.getDouble(6) == 0.0)
  }

  test("one outlier day: Theil-Sen slope exactly unmoved, OLS dragged off") {
    // outlier at the ENDPOINT day: maximal least-squares leverage (an
    // outlier at the mean of d has exactly zero pull on the OLS slope)
    val n = 15
    val xs = (1 to n).map(d => if (d == n) 1000000L else 3L * d)
    val daily = (1 to n).map(d => ("o", day(d), xs(d - 1))).toDF("g", "day", "x")
    val row = operators.Trend.mannKendall(daily).collect().head
    assert(row.getDouble(6) == 3.0,
      s"median pairwise slope must ignore the outlier: $row")
    // the series stays strictly increasing: S is untouched at n(n-1)/2
    assert(row.getLong(3) == 105L)
    // the least-squares slope on the same points is off by orders of
    // magnitude: b_ols = (n*Sdx - Sd*Sx) / (n*Sdd - Sd^2), exact ints
    val ds = (1 to n).map(_.toLong)
    val sd = ds.sum; val sdd = ds.map(d => d * d).sum
    val sx = xs.sum; val sdx = ds.zip(xs).map { case (d, x) => d * x }.sum
    val ols = (n * sdx - sd * sx).toDouble / (n * sdd - sd * sd)
    assert(math.abs(ols - 3.0) > 1000.0, s"OLS must be dragged: $ols")
  }

  test("tie case [1,1,2]: hand-computed tie-corrected variance and z") {
    val daily = Seq(("t", day(1), 1L), ("t", day(2), 1L), ("t", day(3), 2L))
      .toDF("g", "day", "x")
    val row = operators.Trend.mannKendall(daily).collect().head
    assert(row.getLong(1) == 3L && row.getLong(2) == 3L)
    assert(row.getLong(3) == 2L) // signs: 0, +1, +1
    // var = (3*2*11 - 2*1*9) / 18 = 48/18
    assert(row.getDouble(4) == math.rint(48.0 / 18.0 * 1e6) / 1e6)
    val z = 1.0 / math.sqrt(48.0 / 18.0)
    assert(math.abs(row.getDouble(5) - z) < 1e-6)
    // slopes: 0/1, 1/2, 1/1 -> median 0.5
    assert(row.getDouble(6) == 0.5)
  }

  test("decreasing series mirrors: S = -n(n-1)/2, negative z and slope") {
    val daily = (1 to 10).map(d => ("dn", day(d), 100L - 5L * d)).toDF("g", "day", "x")
    val row = operators.Trend.mannKendall(daily).collect().head
    assert(row.getLong(3) == -45L)
    assert(row.getDouble(5) < 0 && row.getDouble(6) == -5.0)
  }

  test("single-day groups emit nothing, by contract") {
    val daily = Seq(("one", day(1), 5L), ("two", day(1), 3L), ("two", day(2), 9L))
      .toDF("g", "day", "x")
    val r = operators.Trend.mannKendall(daily).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("two"))
  }
}
