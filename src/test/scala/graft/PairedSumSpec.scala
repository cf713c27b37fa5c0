package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-equality laws for the paired-longs exact-sum path (VERDICT r13
  * item 1: the DecimalAb prototype, now wired into the decimal-moment
  * family as [[Canon.pterm]]/[[Canon.psumAggs]]/[[Canon.psum1]]).
  *
  * The claim under test is not "close": every converted operator keeps
  * its decimal path behind the parameter default, and these tests
  * assert the paired result `equals` the decimal result row-for-row —
  * the exact substitution the unchanged DuckDB oracles rely on. */
class PairedSumSpec extends AnyFunSuite {
  import SparkTestSession._

  private def bitEqual(a: DataFrame, b: DataFrame, what: String): Unit = {
    val (ra, rb) = (a.collect(), b.collect())
    assert(ra.length == rb.length, s"$what: ${ra.length} vs ${rb.length} rows")
    ra.zip(rb).foreach { case (x, y) =>
      assert(x == y, s"$what row mismatch:\n  paired  $x\n  decimal $y") }
  }

  test("Canon laws: psum equals the decimal sum on signed, NULL-bearing " +
      "data at scales 0/2/6/12/14 within each scale's |t|·10^s bound") {
    import spark.implicits._
    // deterministic pseudo-random signed values with NULL rows and one
    // all-NULL group; magnitudes large enough that Σu crosses 2^30
    // blocks and hi goes negative. Per scale the values shrink to keep
    // |t|·10^s < 2^63 (the pterm contract); scale 0 gets integers
    // (pterm(·, 0) is a plain long cast — integral input only).
    def data(shrink: Double, integral: Boolean) = (1 to 20000).map { i =>
      val g = i % 7
      val v =
        if (i % 97 == 0) null
        else {
          val m = ((i * 2654435761L) % 200000000000L) - 100000000000L
          val x = m / 100.0 / shrink
          java.lang.Double.valueOf(if (integral) math.floor(x) else x)
        }
      (g, if (g == 6) null else v)
    }
    for ((s, shrink) <- Seq(0 -> 1.0, 2 -> 1.0, 6 -> 1.0,
        12 -> 1e6, 14 -> 1e8)) {
      val df = data(shrink, integral = s == 0).toDF("g", "x")
      val dec = df.groupBy(col("g"))
        .agg(sum(col("x").cast(s"decimal(38,$s)")).cast("double").as("v"))
      val vAggs = Canon.psumAggs(Canon.pterm(col("x"), s), "v")
      val paired = df.groupBy(col("g"))
        .agg(vAggs.head, vAggs.tail: _*)
        .select(col("g"), Canon.psumDouble("v", s).as("v"))
      bitEqual(paired.orderBy("g"), dec.orderBy("g"), s"psumAggs scale=$s")
      val one = df.groupBy(col("g")).agg(Canon.psum1(col("x"), s).as("v"))
      bitEqual(one.orderBy("g"), dec.orderBy("g"), s"psum1 scale=$s")
    }
  }

  test("q164/q166 operators: paired corrMatrix and spearman's doubled-rank " +
      "moments equal the decimal-path results bit-for-bit") {
    val base = Tables.t(spark, sf, "lineitem").select(
      col("l_returnflag").as("g"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"))
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    bitEqual(
      operators.Assoc.corrMatrix(base, cols, pairedColScale = Some(2)),
      operators.Assoc.corrMatrix(base, cols, pairedColScale = None),
      "corrMatrix lineitem")
    // doubled long ranks: Pearson over 2r must equal Pearson over r —
    // the power-of-two-scaling lemma the q166 oracle relies on
    import spark.implicits._
    val ranks = (1 to 500).map { i =>
      ("a", i.toDouble, (if (i % 5 == 0) i else 501 - i).toDouble + 0.5) }
      .toDF("g", "x", "y")
    val halves = ranks // x integer ranks, y half-integer ranks
    val viaLong = operators.Assoc.corrMatrix(
      halves.select(col("g"), (col("x") * 2).cast("long").as("x"),
        (col("y") * 2).cast("long").as("y")),
      Seq("x", "y"), pairedColScale = Some(0))
    val viaDec = operators.Assoc.corrMatrix(halves, Seq("x", "y"))
    bitEqual(viaLong, viaDec, "corrMatrix doubled ranks")
  }

  test("q151/q152/q155/q121 operators: paired giniSketch/profile and the " +
      "q121 moments equal their decimal-path twins bit-for-bit") {
    val gbase = Tables.t(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(Canon.psum1(col("o_totalprice"), 2).as("x"))
      .select(lit("all").as("g"), col("x"))
    bitEqual(
      operators.Gini.giniSketch(gbase, pairedScale = Some(2)),
      operators.Gini.giniSketch(gbase),
      "giniSketch orders revenue")
    val pbase = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    bitEqual(
      operators.RobustStats.profile(spark, pbase, pairedScale = Some(2)),
      operators.RobustStats.profile(spark, pbase),
      "profile lineitem price")
    // q121's exact shape: scale-12 value and scale-14 square sums over
    // float-derived doubles (arbitrary mantissas — the pterm cast must
    // reproduce the decimal cast's HALF_UP rounding exactly)
    val e = Tables.t(spark, sf, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("pos").as("dim"), col("xf").cast("double").as("x"))
    val dec = e.groupBy(col("dim")).agg(
      sum(col("x").cast("decimal(28,12)")).cast("double").as("s1"),
      sum((col("x") * col("x")).cast("decimal(28,14)")).cast("double").as("s2"))
    val mAggs = Canon.psumAggs(Canon.pterm(col("x"), 12), "s1") ++
      Canon.psumAggs(Canon.pterm(col("x") * col("x"), 14), "s2")
    val paired = e.groupBy(col("dim")).agg(mAggs.head, mAggs.tail: _*)
      .select(col("dim"), Canon.psumDouble("s1", 12).as("s1"),
        Canon.psumDouble("s2", 14).as("s2"))
    bitEqual(paired.orderBy("dim"), dec.orderBy("dim"), "q121 moments")
  }

  test("q147 operator: paired olsByGroup matches the decimal path on the " +
      "registry input (y is exact at 4 dp, recovered from the double)") {
    // the decimal path sums y's double-noise 12-dp cast while the
    // paired path recovers the EXACT 4-dp product — sums differ below
    // 1e-11 relative, so the 9-dp outputs must be identical
    val base = Tables.t(spark, sf, "lineitem").select(
      col("l_returnflag").as("g"), col("l_extendedprice").as("x"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("y"))
    bitEqual(
      operators.Ols.olsByGroup(base, pairedScales = Some((2, 4))),
      operators.Ols.olsByGroup(base),
      "olsByGroup lineitem net-vs-gross")
  }
}
