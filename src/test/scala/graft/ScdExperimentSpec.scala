package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q135 (SCD2 decisions), q136 (CUPED), q137 (attribution). */
class ScdExperimentSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("q135: every derived change is classified; update delta is exactly +100") {
    val rows = SparkEntry.queries("q135_scd2")(spark, sf).collect()
    val byAction = rows.groupBy(_.getString(1))
    assert(!byAction.contains("delete"), "snapshot covers all current keys")
    byAction("insert").foreach { r =>
      assert(r.getLong(0) % 13 == 0, s"unexpected insert ${r.getLong(0)}")
      assert(r.isNullAt(2), "insert must have no old value")
    }
    byAction("update").foreach { r =>
      assert(r.getLong(0) % 7 == 0 && r.getLong(0) % 13 != 0)
      assert(math.abs(r.getDouble(3) - r.getDouble(2) - 100.0) < 1e-9,
        s"update delta wrong: $r")
    }
    val expInserts = Tables.t(spark, sf, "customer")
      .where(col("c_custkey") % 13 === 0).count()
    assert(byAction("insert").length.toLong == expInserts)
  }

  test("scd2Decide: delete classification fires when a key leaves the snapshot") {
    val cur = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val snap = Seq((1L, 10.0)).toDF("k", "v")
    val got = graft.operators.Scd.scd2Decide(cur, snap, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "delete"))
  }

  test("q136: CUPED preserves the pooled mean (Σ nₐ·ŷₐ = Σ nₐ·ȳₐ)") {
    val rows = SparkEntry.queries("q136_cuped")(spark, sf).collect()
    assert(rows.length == 2)
    val rawPooled = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    val adjPooled = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(rawPooled - adjPooled) < 1e-3,
      s"adjustment shifted the pooled mean: $rawPooled vs $adjPooled")
    assert(rows.forall(r => !r.getDouble(4).isNaN), "theta degenerate")
  }

  test("q137: attribution buckets conserve the purchase count") {
    val rows = SparkEntry.queries("q137_attribution")(spark, sf).collect()
    val total = Tables.t(spark, sf, "events")
      .where(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("click_1h", "organic")))
  }
}
