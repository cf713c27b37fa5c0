package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form and invariance laws for the round-12 series/survival
  * additions:
  *  - q169 CUSUM changepoint: a planted step is located exactly at its
  *    boundary with the hand-computable scaled statistic; a constant
  *    series scores zero with the earliest-day tie-break; the statistic
  *    is exactly invariant to a level shift (T = n·cum − d·total kills
  *    any additive constant algebraically) and exactly linear in a
  *    multiplicative one;
  *  - q170 Nelson–Aalen: the no-censoring distinct-duration case gives
  *    the textbook shrinking risk sets and harmonic cumulative hazard;
  *    censored subjects hold the risk set up to their time but emit no
  *    event row; tied events fold into one row with d > 1.
  */
class SeriesSurvivalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def day(d: Int) = java.sql.Date.valueOf(f"2024-01-$d%02d")

  test("cusum locates a planted step at its boundary with exact statistics") {
    val daily = (1 to 20)
      .map(d => ("s", day(d), if (d <= 12) 10L else 50L))
      .toDF("g", "day", "x")
    val r = operators.Changepoint.cusum(daily).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "s")
    assert(row.getDate(1) == day(12), s"changepoint must sit at the step: $row")
    // total = 12*10 + 8*50 = 520; T_12 = 20*120 - 12*520 = -3840
    assert(row.getLong(2) == 3840L)
    assert(row.getDouble(3) == 192.0) // 3840 / 20
    assert(row.getDouble(4) == 10.0 && row.getDouble(5) == 50.0)
  }

  test("constant series: zero statistic, earliest-day tie-break, equal means") {
    val daily = (1 to 15).map(d => ("c", day(d), 7L)).toDF("g", "day", "x")
    val row = operators.Changepoint.cusum(daily).collect().head
    assert(row.getDate(1) == day(1) && row.getLong(2) == 0L)
    assert(row.getDouble(3) == 0.0)
    assert(row.getDouble(4) == 7.0 && row.getDouble(5) == 7.0)
  }

  test("cusum is exactly level-shift invariant and scale linear") {
    val rnd = new scala.util.Random(42)
    val base = (1 to 30).map(d => d -> (rnd.nextInt(100) + 1).toLong)
    val daily = base.flatMap { case (d, x) =>
      Seq(("a", day(d), x), ("b", day(d), x + 1000L), ("c", day(d), x * 10L))
    }.toDF("g", "day", "x")
    val r = operators.Changepoint.cusum(daily).collect()
      .map(row => row.getString(0) -> row).toMap
    val (a, b, c) = (r("a"), r("b"), r("c"))
    // level shift: statistic, location and s_max identical; means move by +1000
    assert(b.getDate(1) == a.getDate(1) && b.getLong(2) == a.getLong(2))
    assert(b.getDouble(3) == a.getDouble(3))
    assert(b.getDouble(4) == a.getDouble(4) + 1000.0)
    assert(b.getDouble(5) == a.getDouble(5) + 1000.0)
    // scale: location fixed, T exactly x10
    assert(c.getDate(1) == a.getDate(1) && c.getLong(2) == 10L * a.getLong(2))
  }

  test("single-day groups emit no changepoint row, by contract") {
    val daily = Seq(("one", day(1), 5L), ("two", day(1), 3L), ("two", day(2), 9L))
      .toDF("g", "day", "x")
    val r = operators.Changepoint.cusum(daily).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("two"))
  }

  test("no censoring, distinct durations: textbook risk sets, harmonic hazard") {
    val durs = (1 to 10).map(i => (i.toLong, 1L)).toDF("dur", "observed")
    val r = operators.Survival.hazard(durs).collect()
    assert(r.length == 10)
    r.zipWithIndex.foreach { case (row, i) =>
      assert(row.getLong(0) == i + 1L)
      assert(row.getLong(1) == 10L - i, s"risk set must shrink by one: $row")
      assert(row.getLong(2) == 1L)
      assert(math.abs(row.getDouble(3) - 1.0 / (10 - i)) < 1e-9)
    }
    val harmonic = (1 to 10).map(k => 1.0 / k).sum
    assert(math.abs(r.last.getDouble(4) - harmonic) < 1e-8)
  }

  test("censored subjects hold the risk set until their time, no event row") {
    val durs = Seq((2L, 1L), (3L, 0L), (5L, 1L)).toDF("dur", "observed")
    val r = operators.Survival.hazard(durs).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 5L), "only event times emit rows")
    assert(r(0).getLong(1) == 3L && r(0).getLong(2) == 1L) // all three at risk at 2
    assert(r(1).getLong(1) == 1L && r(1).getLong(2) == 1L) // censored-at-3 is gone
    assert(math.abs(r(1).getDouble(4) - (1.0 / 3 + 1.0)) < 1e-8)
  }

  test("tied events fold into one row with d > 1") {
    val durs = Seq((4L, 1L), (4L, 1L), (4L, 0L), (7L, 1L)).toDF("dur", "observed")
    val r = operators.Survival.hazard(durs).collect()
    assert(r.length == 2)
    assert(r(0).getLong(0) == 4L && r(0).getLong(1) == 4L && r(0).getLong(2) == 2L)
    assert(r(0).getDouble(3) == 0.5)
    assert(r(1).getLong(0) == 7L && r(1).getLong(1) == 1L && r(1).getDouble(3) == 1.0)
  }
}
