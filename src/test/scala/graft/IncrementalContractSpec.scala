package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q128 (incremental aggregate maintenance), q129 (data contract),
  * q130 (resample + forward fill). The driver oracle owns equality;
  * here: cut-invariance of the merge, planted-violation detection, and
  * the fill law. */
class IncrementalContractSpec extends AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  test("q128: the maintained state is invariant to WHERE the base/delta cut falls") {
    // the registry entry cuts at 1998-01-01; the law says ANY cut gives
    // the same merged state — probe a second cut and compare
    val li = Tables.t(spark, sf, "lineitem")
    def state(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("l_quantity").cast("decimal(28,2)")).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    val cut = lit("1996-06-15").cast("timestamp")
    val merged = graft.operators.Incremental.mergeStates(
      state(li.where(col("l_shipdate") < cut)),
      state(li.where(col("l_shipdate") >= cut)),
      Seq("l_returnflag"))
      .orderBy(col("l_returnflag")).collect()
    val direct = state(li).orderBy(col("l_returnflag")).collect()
    assert(merged.map(_.toString).toSeq == direct.map(_.toString).toSeq)
  }

  test("q129: rule counts match independent computation (fixture HAS real dup keys)") {
    val report = SparkEntry.queries("q129_data_contract")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report.size == 4)
    // domain / null / FK rules hold on the fixture
    assert(report("qty_in_[1,50]") == 0L)
    assert(report("keys_not_null") == 0L)
    assert(report("orderkey_fk_exists") == 0L)
    // the synthetic fixture genuinely repeats (orderkey, linenumber) —
    // the contract must REPORT that, not assume cleanliness; verify the
    // surplus count against an independent computation
    val dups = Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber")).count()
      .where(col("count") > 1)
      .agg(sum(col("count") - 1)).collect()(0).getLong(0)
    assert(report("orderkey_linenumber_unique") == dups && dups > 0,
      s"surplus-row count ${report("orderkey_linenumber_unique")} != $dups")
  }

  test("q130: gap rows carry the previous observation; non-gap rows match their bucket") {
    val rows = SparkEntry.queries("q130_resample_ffill")(spark, sf).collect()
    val byK = rows.groupBy(_.getString(0))
    var gaps = 0
    byK.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getTimestamp(1).getTime)
      var last: Option[Double] = None
      sorted.foreach { r =>
        val v = if (r.isNullAt(2)) None else Some(r.getDouble(2))
        if (r.getBoolean(3)) { // gap: must equal the carried value
          gaps += 1
          assert(v == last, s"gap row $r does not carry $last")
        } else last = v
      }
    }
    // leading gaps (before the first observation) are impossible: the
    // grid starts at each key's first OBSERVED hour
    assert(rows.nonEmpty)
  }
}
