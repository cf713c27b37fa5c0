package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q141 (TWAP), q142 (k-anonymity), q143 (MoM growth). */
class ReportingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q144: conversion rate valid; latency percentiles ordered and positive") {
    val r = SparkEntry.queries("q144_conversion_lag")(spark, sf).collect()(0)
    val (nS, nC, rate) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nC <= nS && rate > 0 && rate <= 1.0, s"bad conversion row $r")
    val (p50, p90) = (r.getDouble(3), r.getDouble(4))
    assert(p50 > 0 && p90 >= p50, s"percentiles disordered: $r")
  }

  test("q145: extractors count planted spans exactly; fixture report is clean") {
    import spark.implicits._
    // fixture corpus carries no identifier-like spans: all-zero is the
    // CORRECT report, so prove the extractors on planted text
    val fixture = SparkEntry.queries("q145_span_report")(spark, sf).collect()
    assert(fixture.forall(r => r.getLong(2) == 0 && r.getLong(3) == 0))
    val planted = Seq(
      ("a", "contact bob@mail.com or sue@web.org today"),
      ("a", "see https://example.com/x and id 1234567"),
      ("b", "no identifiers here at all"),
      ("c", "Reach Bob@Mail.com over HTTPS://Example.COM/Path now")).toDF("source", "text")
    val got = graft.operators.Extraction.spanReport(planted)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((2L, 1L, 1L)), s"planted counts wrong: $got")
    assert(got("b") == ((0L, 0L, 0L)))
    assert(got("c") == ((1L, 1L, 0L)), s"mixed-case spans missed: $got")
  }

  test("q141: TWAP lies inside the observed value range; weights cover the span") {
    val rows = SparkEntry.queries("q141_twap")(spark, sf).collect()
    assert(rows.nonEmpty)
    val rng = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = rng(r.getString(0))
      val twap = r.getDouble(2)
      assert(twap >= lo && twap <= hi, s"TWAP outside value range: $r")
    }
  }

  test("q141 differential: composite-day stitched lead equals the single-window lead") {
    // the r9 scale-safe plan partitions by (event_type, day) and
    // stitches day boundaries; it must produce the SAME next_ts column
    // as the |event_type|-partitioned window it replaces (the driver
    // oracle replays the single-window definition, so the hash compare
    // re-proves this at every sf — here the row-level equality)
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.t(spark, sf, "events")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    val single = ev.withColumn("next_single", lead(col("ts"), 1).over(w))
      .select(col("event_id"), col("next_single"))
    val stitched = graft.operators.Twap.leadTsStitched(ev, "event_type")
      .select(col("event_id"), col("next_ts"))
    val diff = stitched.join(single, "event_id")
      .where(!(col("next_ts") <=> col("next_single")))
      .count()
    assert(diff == 0, s"$diff rows disagree between stitched and single-window lead")
  }

  test("q142: class histogram conserves the customer count") {
    val rows = SparkEntry.queries("q142_k_anonymity")(spark, sf).collect()
    val total = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val customers = Tables.t(spark, sf, "customer").count()
    assert(total == customers, s"histogram covers $total of $customers rows")
    // exposed rows are exactly the sub-k classes' members
    rows.foreach { r =>
      val (size, n, exposed) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(exposed == (if (size < 5) size * n else 0L), s"exposure law: $r")
    }
  }

  test("q143: MoM deltas telescope back to the month-12 revenue") {
    val rows = SparkEntry.queries("q143_mom_growth")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (nation, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      // first month's delta is 0 by the COALESCE convention
      assert(sorted.head.getDouble(3) == 0.0, s"$nation first-month delta")
      // telescoping: first revenue + sum of later deltas = last revenue
      val rebuilt = sorted.head.getDouble(2) + sorted.tail.map(_.getDouble(3)).sum
      assert(math.abs(rebuilt - sorted.last.getDouble(2)) < 0.05,
        s"$nation deltas do not telescope: $rebuilt vs ${sorted.last.getDouble(2)}")
    }
  }
}
