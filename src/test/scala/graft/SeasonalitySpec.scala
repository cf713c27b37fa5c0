package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form laws for q173 (weekly seasonality profile):
  *  - a series that depends ONLY on day-of-week reads strength = 1
  *    exactly (within-dow variance is zero) with the planted means;
  *  - a constant series has SS_total = 0 ⇒ strength NULL (undefined);
  *  - strength is level-shift invariant (the S²/N term absorbs any
  *    additive constant algebraically) and scale invariant;
  *  - a series with zero weekly structure but real variance reads a
  *    small strength (< the pure-weekly 1), sanity-bounding η² ∈ [0,1];
  *  - dow is the epoch-day index mod 7 — pure arithmetic, so two dates
  *    7 days apart always share a bucket (no locale/ISO convention).
  */
class SeasonalitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def day(d: Int) = java.sql.Date.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(d - 1).toString)

  test("pure weekly series: strength exactly 1, planted dow means exact") {
    // 4 full weeks; x depends only on dow
    val amp = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L)
    val daily = (1 to 28).map(d => ("w", day(d), amp((d - 1) % 7)))
      .toDF("g", "day", "x")
    val r = operators.Seasonality.weeklyProfile(daily).collect()
    assert(r.length == 7)
    r.foreach { row =>
      assert(row.getLong(2) == 4L)
      assert(row.getDouble(5) == 1.0, s"pure weekly must read 1: $row")
    }
    // day(1) = 2024-01-01; its bucket mean is amp(0) = 10
    val means = r.map(row => row.getLong(1) -> row.getDouble(3)).toMap
    assert(means.values.toSet == amp.map(_.toDouble).toSet)
    assert(r.head.getDouble(4) == 40.0, "overall mean of 10..70 is 40")
  }

  test("constant series: SS_total = 0, strength NULL") {
    val daily = (1 to 21).map(d => ("c", day(d), 9L)).toDF("g", "day", "x")
    val r = operators.Seasonality.weeklyProfile(daily).collect()
    assert(r.length == 7)
    r.foreach(row => assert(row.isNullAt(5)))
  }

  test("strength is level-shift and scale invariant") {
    val rnd = new scala.util.Random(7)
    val base = (1 to 35).map(d => d -> (rnd.nextInt(50) + 10).toLong)
    val daily = base.flatMap { case (d, x) =>
      Seq(("a", day(d), x), ("b", day(d), x + 5000L), ("c", day(d), x * 100L))
    }.toDF("g", "day", "x")
    val r = operators.Seasonality.weeklyProfile(daily).collect()
      .groupBy(_.getString(0)).map { case (g, rows) =>
        g -> rows.head.getDouble(5)
      }
    assert(math.abs(r("a") - r("b")) < 1e-7, s"level shift moved strength: $r")
    assert(math.abs(r("a") - r("c")) < 1e-7, s"scaling moved strength: $r")
  }

  test("unstructured variance reads low strength; eta2 stays in [0,1]") {
    // alternating high/low with period 2 smears across dow buckets over
    // 5 weeks (gcd(2,7)=1): weekly cycle explains little
    val daily = (1 to 35).map(d => ("u", day(d), if (d % 2 == 0) 100L else 50L))
      .toDF("g", "day", "x")
    val r = operators.Seasonality.weeklyProfile(daily).collect()
    val s = r.head.getDouble(5)
    assert(s >= 0.0 && s <= 1.0)
    assert(s < 0.2, s"period-2 structure must not read as weekly: $s")
  }

  test("dow buckets by epoch-day mod 7: dates 7 apart share a bucket") {
    val daily = Seq(("m", day(3), 5L), ("m", day(10), 7L), ("m", day(17), 9L),
      ("m", day(4), 100L)).toDF("g", "day", "x")
    val r = operators.Seasonality.weeklyProfile(daily).collect()
    assert(r.length == 2, "three dates 7 apart fold into one dow bucket")
    val big = r.find(_.getLong(2) == 3L).get
    assert(big.getDouble(3) == 7.0) // (5+7+9)/3
  }
}
