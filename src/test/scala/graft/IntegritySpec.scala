package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-defect laws for the q174/q175/q176 audit family — each
  * operator must DETECT what it audits (the fixture itself is clean,
  * so the registry rows alone only prove the zero case):
  *  - lDiversity: a homogeneous class (one sensitive value across many
  *    rows) fails the floor even though it is k-anonymous — the exact
  *    homogeneity attack k-anonymity misses;
  *  - refIntegrity: planted orphans are counted by row AND by distinct
  *    key, per edge, in one pass; a fact key that is NULL joins to
  *    nothing and counts as an orphan row with no missing key;
  *  - fdAudit: a violated dependency reports the violating determinant
  *    count, the row mass under violators, and the worst fan-out; a
  *    key FD holds with max_fanout 1.
  */
class IntegritySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("l-diversity: homogeneous class fails even when k-anonymous") {
    val rows = (1 to 50).map(i => ("NY", "A", "HIGH")) ++ // k=50, l=1
      Seq(("SF", "B", "HIGH"), ("SF", "B", "LOW"), ("SF", "B", "MED"))
    val df = rows.toDF("city", "seg", "income")
    val r = operators.Privacy.lDiversity(df, Seq("city", "seg"), "income")
      .collect()
    val ny = r.find(_.getString(0) == "NY").get
    assert(ny.getLong(2) == 50L && ny.getLong(3) == 1L && !ny.getBoolean(4),
      s"a 50-row single-value class must fail l-diversity: $ny")
    val sf = r.find(_.getString(0) == "SF").get
    assert(sf.getLong(3) == 3L && sf.getBoolean(4))
  }

  test("ref integrity: planted orphans counted by row and distinct key, one pass") {
    val fact = Seq((1L, 10L), (2L, 10L), (3L, 99L), (4L, 99L), (5L, 98L))
      .toDF("id", "fk")
    val dim = Seq(10L, 11L).toDF("k")
    val r = operators.Integrity.refIntegrity(fact, Seq(
      "f.fk" -> (("fk", dim)))).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 5L)
    assert(row.getLong(2) == 3L, s"rows 3,4,5 are orphans: $row")
    assert(row.getDouble(3) == 0.6)
    assert(row.getLong(4) == 2L, "missing keys are {99, 98}")
  }

  test("ref integrity: NULL fact keys are orphan rows but not missing keys") {
    val fact = Seq(Some(10L), None, None).toDF("fk")
    val dim = Seq(10L).toDF("k")
    val row = operators.Integrity.refIntegrity(fact,
      Seq("e" -> (("fk", dim)))).collect().head
    assert(row.getLong(2) == 2L && row.getLong(4) == 0L)
  }

  test("ref integrity: two edges audited in the same single fact pass") {
    val fact = Seq((10L, 7L), (10L, 8L), (11L, 9L)).toDF("a", "b")
    val dimA = Seq(10L).toDF("k")
    val dimB = Seq(7L, 9L).toDF("k")
    val r = operators.Integrity.refIntegrity(fact, Seq(
      "edge.a" -> (("a", dimA)), "edge.b" -> (("b", dimB))))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("edge.a").getLong(2) == 1L) // the a=11 row
    assert(r("edge.b").getLong(2) == 1L) // the b=8 row
    assert(r("edge.a").getLong(1) == 3L && r("edge.b").getLong(1) == 3L)
  }

  test("fd audit: violation mass, worst fan-out, and a holding key FD") {
    val df = Seq(
      (1L, "X", "p1"), (1L, "X", "p1"), // key 1 consistent
      (2L, "Y", "p2"), (2L, "Z", "p2"), // key 2 violates a->b
      (3L, "W", "p3")
    ).toDF("a", "b", "c")
    val r = operators.Integrity.fdAudit(df, Seq("a" -> "b", "a" -> "c"))
      .collect().map(x => x.getString(0) -> x).toMap
    val ab = r("a->b")
    assert(ab.getLong(1) == 3L && ab.getLong(2) == 1L)
    assert(ab.getLong(3) == 2L, s"two rows sit under the violating key: $ab")
    assert(ab.getLong(4) == 2L && !ab.getBoolean(5))
    val ac = r("a->c")
    assert(ac.getLong(2) == 0L && ac.getLong(4) == 1L && ac.getBoolean(5))
  }
}
