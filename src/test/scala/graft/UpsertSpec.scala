package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Upsert (q66): last-writer-wins merge semantics on a hand-built
  * base/changeset pair.
  */
class UpsertSpec extends AnyFunSuite {
  import SparkTestSession._

  test("updates replace, inserts append, untouched rows pass through") {
    import spark.implicits._
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "v", "n")
    val changes = Seq((2L, "B", 99), (9L, "z", 1)).toDF("k", "v", "n")
    val out = operators.Upsert.upsert(base, changes, "k")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out == Map(
      1L -> ("a", 10), 2L -> ("B", 99), 3L -> ("c", 30), 9L -> ("z", 1)))
  }

  test("mismatched schemas are rejected") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, 2)).toDF("k", "n")
    assertThrows[IllegalArgumentException](
      operators.Upsert.upsert(base, changes, "k"))
  }
}
