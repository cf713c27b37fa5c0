package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form laws for q172 (trailing-window OLS slope):
  *  - a linear-in-date series reads slope EXACTLY b at every day with
  *    a ≥2-point window, gaps included (any subset of collinear points
  *    fits the same line);
  *  - the window is CALENDAR range, not row count: a gap wider than
  *    the window resets it (win_n = 1 ⇒ NULL), and gapped days shrink
  *    win_n rather than stretching the window;
  *  - a tent series (rise b, fall −b) flips sign once the window
  *    clears the peak — the trend-turn signal the global q171 cannot
  *    localize;
  *  - a constant series reads slope 0 at every fitted day;
  *  - the two-point fit is the hand-computable rise-over-run.
  */
class RollingTrendSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def day(d: Int) = java.sql.Date.valueOf(f"2024-05-$d%02d")

  test("linear-in-date series: exact slope b at every >=2-point day, gaps included") {
    val days = Seq(1, 2, 3, 5, 6, 9, 10, 13)
    val daily = days.map(d => ("lin", day(d), 100L + 4L * d)).toDF("g", "day", "x")
    val r = operators.RollingTrend.rollingSlope(daily).collect()
    assert(r.length == days.size)
    assert(r.head.isNullAt(3), "first day has a one-point window")
    r.tail.foreach { row =>
      assert(row.getLong(2) >= 2)
      assert(row.getDouble(3) == 4.0, s"collinear points must fit exactly: $row")
    }
    // day 9's trailing 7 calendar days are 3..9: observed {3, 5, 6, 9}
    val d9 = r.find(_.getDate(1) == day(9)).get
    assert(d9.getLong(2) == 4L)
  }

  test("a gap wider than the window resets it: win_n = 1, slope NULL") {
    val daily = Seq(("gap", day(1), 10L), ("gap", day(2), 20L),
      ("gap", day(20), 99L)).toDF("g", "day", "x")
    val r = operators.RollingTrend.rollingSlope(daily).collect()
    val after = r.find(_.getDate(1) == day(20)).get
    assert(after.getLong(2) == 1L && after.isNullAt(3))
    assert(r.find(_.getDate(1) == day(2)).get.getDouble(3) == 10.0)
  }

  test("tent series: slope flips to exactly -b once the window clears the peak") {
    // rise 6/day through day 10, fall -6/day after
    val daily = (1 to 20).map { d =>
      val x = if (d <= 10) 6L * d else 60L - 6L * (d - 10)
      ("tent", day(d), x)
    }.toDF("g", "day", "x")
    val r = operators.RollingTrend.rollingSlope(daily).collect()
    val bySlope = r.filter(!_.isNullAt(3))
      .map(row => row.getDate(1) -> row.getDouble(3)).toMap
    assert(bySlope(day(8)) == 6.0, "pre-peak window is pure rise")
    // day 17's window is days 11..17, pure fall
    assert(bySlope(day(17)) == -6.0, "post-peak window is pure fall")
    // day 12 straddles the peak: slope strictly between the legs
    assert(bySlope(day(12)) > -6.0 && bySlope(day(12)) < 6.0)
  }

  test("constant series: slope exactly 0 at every fitted day") {
    val daily = (1 to 10).map(d => ("c", day(d), 7L)).toDF("g", "day", "x")
    val r = operators.RollingTrend.rollingSlope(daily).collect()
    r.filter(!_.isNullAt(3)).foreach(row => assert(row.getDouble(3) == 0.0))
    assert(r.count(!_.isNullAt(3)) == 9)
  }

  test("two-point fit is rise over run") {
    val daily = Seq(("h", day(3), 10L), ("h", day(6), 25L)).toDF("g", "day", "x")
    val r = operators.RollingTrend.rollingSlope(daily).collect()
    assert(r.last.getDouble(3) == 5.0) // (25-10)/(6-3)
  }
}
