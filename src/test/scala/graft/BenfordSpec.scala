package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form laws for q177 (Benford first-digit audit):
  *  - all-ones data reads TVD = 1 − P(1) exactly with worst digit 1;
  *  - uniform-digit data reads the hand-computed ½Σ|1/9 − P(d)|;
  *  - the audit is scale-invariant under ×10 (first digits are);
  *  - floor semantics: 1999.99 reads digit 1 (not DuckDB's rounded 2);
  *  - values below 1 are excluded by contract.
  */
class BenfordSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val P = Map(
    1 -> 0.301029995664, 2 -> 0.176091259056, 3 -> 0.124938736608,
    4 -> 0.096910013008, 5 -> 0.079181246048, 6 -> 0.066946789631,
    7 -> 0.057991946978, 8 -> 0.051152522447, 9 -> 0.045757490561)

  test("all-ones data: TVD = 1 - P(1), worst digit 1 with positive excess") {
    val rows = (1 to 100).map(i => ("a", 1.0 + (i % 9) * 0.1)).toDF("g", "x")
    val r = operators.Benford.firstDigitAudit(rows).collect().head
    assert(r.getLong(1) == 100L)
    assert(math.abs(r.getDouble(2) - (1.0 - P(1))) < 1e-8, s"got $r")
    assert(r.getInt(3) == 1)
    assert(math.abs(r.getDouble(4) - (1.0 - P(1))) < 1e-8)
  }

  test("uniform-digit data reads the hand-computed TVD") {
    val rows = (1 to 9).flatMap(d => (1 to 10).map(_ => ("u", d * 10.0 + 1)))
      .toDF("g", "x")
    val r = operators.Benford.firstDigitAudit(rows).collect().head
    val expected = (1 to 9).map(d => math.abs(1.0 / 9 - P(d)) / 2).sum
    assert(r.getLong(1) == 90L)
    assert(math.abs(r.getDouble(2) - expected) < 1e-8, s"got $r vs $expected")
    // digit 1 has the largest deviation (1/9 vs 0.301)
    assert(r.getInt(3) == 1 && r.getDouble(4) < 0)
  }

  test("audit is exactly scale-invariant under x10") {
    val rnd = new scala.util.Random(3)
    val base = (1 to 500).map(_ => 1.0 + rnd.nextDouble() * 8000)
    val rows = (base.map(("a", _)) ++ base.map(x => ("b", x * 10)))
      .toDF("g", "x")
    val r = operators.Benford.firstDigitAudit(rows).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("a").getDouble(2) == r("b").getDouble(2))
    assert(r("a").getInt(3) == r("b").getInt(3))
    assert(r("a").getDouble(4) == r("b").getDouble(4))
  }

  test("floor semantics and the x >= 1 exclusion") {
    val rows = Seq(("f", 1999.99), ("f", 9.99), ("f", 0.5), ("f", 0.0001),
      ("tiny", 0.3)).toDF("g", "x")
    val r = operators.Benford.firstDigitAudit(rows).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("f"),
      "all-sub-1 groups must be absent")
    assert(r.head.getLong(1) == 2L, "0.5 and 0.0001 are excluded")
    // digits are 1 (floor of 1999.99) and 9 — if DuckDB-style rounding
    // leaked in, 1999.99 would read digit 2
  }
}
