package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form laws for q179 (lead–lag screen):
  *  - a planted 2-day shift (b_t = a_{t-2}) reads best_lag = 2 with
  *    corr exactly 1 at 9 dp, while the same-day corr is far from 1 —
  *    the precursor signal q164 cannot see;
  *  - mirrored series (b = C − a) read corr_lag0 = −1 and best_lag 0;
  *  - a constant side is degenerate at every lag: the pair is absent,
  *    by contract (NULL lags never win the rank);
  *  - the sign convention: positive best_lag means ga LEADS gb.
  */
class LeadLagSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def day(d: Int) = java.sql.Date.valueOf(
    java.time.LocalDate.of(2024, 2, 1).plusDays(d - 1).toString)

  private def wiggly(d: Int): Long = 50L + (d * d * 7 % 23) - (d * 13 % 11)

  test("a planted 2-day shift reads best_lag = 2 with corr 1") {
    val a = (1 to 30).map(d => ("a_sig", day(d), wiggly(d)))
    val b = (3 to 30).map(d => ("b_echo", day(d), wiggly(d - 2)))
    val r = operators.LeadLag.leadLag((a ++ b).toDF("g", "day", "x"))
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "a_sig" && row.getString(1) == "b_echo")
    assert(row.getLong(2) == 2L, s"the echo lags by exactly 2 days: $row")
    assert(row.getDouble(4) == 1.0, s"shifted copy must correlate exactly: $row")
    assert(math.abs(row.getDouble(5)) < 0.9, "same-day corr must NOT read the link")
  }

  test("mirrored series: corr_lag0 = -1, best lag 0") {
    val a = (1 to 25).map(d => ("p", day(d), wiggly(d)))
    val b = (1 to 25).map(d => ("q", day(d), 200L - wiggly(d)))
    val row = operators.LeadLag.leadLag((a ++ b).toDF("g", "day", "x"))
      .collect().head
    assert(row.getLong(2) == 0L && row.getDouble(4) == -1.0)
    assert(row.getDouble(5) == -1.0)
  }

  test("a constant side is degenerate at every lag: pair absent by contract") {
    val a = (1 to 20).map(d => ("flat", day(d), 5L))
    val b = (1 to 20).map(d => ("live", day(d), wiggly(d)))
    val r = operators.LeadLag.leadLag((a ++ b).toDF("g", "day", "x"))
      .collect()
    assert(r.isEmpty, s"degenerate pairs must be absent: ${r.toSeq}")
  }

  test("three series: every name-ordered pair audited once") {
    val rows = (1 to 20).flatMap { d =>
      Seq(("x1", day(d), wiggly(d)), ("x2", day(d), wiggly(d + 3)),
        ("x3", day(d), wiggly(d * 2 + 1)))
    }
    val r = operators.LeadLag.leadLag(rows.toDF("g", "day", "x")).collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSet ==
      Set(("x1", "x2"), ("x1", "x3"), ("x2", "x3")))
  }
}
