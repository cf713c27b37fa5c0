package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form laws for q180 (seasonally-adjusted anomaly days):
  *  - a planted spike on a pure-weekly series ranks first with the
  *    hand-computed relative deviation (the spike inflates its own
  *    dow mean — the law's numbers account for it);
  *  - an unbroken weekly pattern scores zero everywhere, with the
  *    day-ascending tie-break;
  *  - zero-mass dow buckets are excluded (undefined baseline), while
  *    partially-zero buckets are scored;
  *  - the Sunday-dip non-law: a day 40% below the GLOBAL mean but
  *    exactly on its dow mean scores 0 — the raw-volume alarm's false
  *    positive, silenced.
  */
class SeasonalAnomalySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def day(d: Int) = java.sql.Date.valueOf(
    java.time.LocalDate.of(2024, 4, 1).plusDays(d - 1).toString)

  private val amp = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L)

  test("a planted spike ranks first with the exact relative deviation") {
    val daily = (1 to 28).map { d =>
      val x = if (d == 17) 110L else amp((d - 1) % 7)
      ("s", day(d), x)
    }.toDF("g", "day", "x")
    val r = operators.SeasonalAnomaly.anomalousDays(daily).collect()
    assert(r.length == 3)
    val top = r.head
    assert(top.getLong(1) == 1L && top.getDate(2) == day(17))
    // dow of day 17 has values {30, 30, 110, 30}: s_d = 200, n_d = 4
    // rel_dev = |110*4 - 200| / 200 = 240/200 = 1.2
    assert(top.getDouble(6) == 1.2, s"hand-computed deviation: $top")
    assert(top.getDouble(5) == 50.0, "expected = 200/4")
    // ranks 2-3: the other days of that dow, |30*4-200|/200 = 0.4,
    // earliest days first
    assert(r(1).getDate(2) == day(3) && r(1).getDouble(6) == 0.4)
    assert(r(2).getDate(2) == day(10))
  }

  test("an unbroken weekly pattern scores zero, ties break day-ascending") {
    val daily = (1 to 21).map(d => ("w", day(d), amp((d - 1) % 7)))
      .toDF("g", "day", "x")
    val r = operators.SeasonalAnomaly.anomalousDays(daily).collect()
    assert(r.length == 3)
    r.foreach(row => assert(row.getDouble(6) == 0.0))
    assert(r.map(_.getDate(2)).toSeq == Seq(day(1), day(2), day(3)))
  }

  test("zero-mass dow buckets are excluded; partially-zero buckets scored") {
    // dow of day 1 is always 0 (undefined baseline); dow of day 2 has
    // one zero among nonzeros (defined, scored)
    val daily = (1 to 14).map { d =>
      val x = (d - 1) % 7 match {
        case 0 => 0L
        case 1 => if (d == 2) 0L else 8L
        case _ => 5L
      }
      ("z", day(d), x)
    }.toDF("g", "day", "x")
    val r = operators.SeasonalAnomaly.anomalousDays(daily).collect()
    assert(!r.exists(_.getDate(2) == day(1)) &&
      !r.exists(_.getDate(2) == day(8)), "all-zero dow must be absent")
    // day 2: |0*2 - 8| / 8 = 1.0 — the top anomaly
    assert(r.head.getDate(2) == day(2) && r.head.getDouble(6) == 1.0)
  }

  test("the Sunday-dip non-law: on-pattern low days score zero") {
    // one dow runs at 10 while all others run at 50: every day is
    // exactly on its dow mean, so NOTHING is anomalous
    val daily = (1 to 21).map { d =>
      ("dip", day(d), if ((d - 1) % 7 == 0) 10L else 50L)
    }.toDF("g", "day", "x")
    val r = operators.SeasonalAnomaly.anomalousDays(daily).collect()
    r.foreach(row => assert(row.getDouble(6) == 0.0,
      s"a global-mean alarm would page here; the seasonal one must not: $row"))
  }
}
