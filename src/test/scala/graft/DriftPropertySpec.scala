package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariant checks for the drift family (q153/q154/q157):
  * 40 seeded-random two-sample fixtures (mixed distribution shapes,
  * sizes, scales) packed into one frame per operator, asserting the
  * mathematical bounds and symmetries that must hold for EVERY input —
  * the complement of ProfilingOpsSpec's planted closed-form cases:
  *  - 0 ≤ TVD ≤ 1 and 0 ≤ χ² ≤ 2 (both saturate only on disjointness);
  *  - KS ≤ TVD (a CDF event is one event: the supremum over partial
  *    sums of Δp cannot exceed the positive-part total), and
  *    0 ≤ KS ≤ 1;
  *  - period swap (A↔B) leaves every divergence and peak unchanged —
  *    the statistics are symmetric by construction.
  * Deterministic: fixed seed, fixed fixture count. */
class DriftPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val Cases = 40

  /** Random two-sample fixture g`i`: sizes 50-450 per period, values
    * from one of four shapes (uniform / two-cluster / heavy-tail-ish
    * via squaring / shifted), scale and shift drawn per period. */
  private def fixtures(seed: Long): Seq[(String, Int, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until Cases).flatMap { i =>
      def sample(n: Int): Seq[Double] = {
        val shape = rnd.nextInt(4)
        val scale = 1.0 + rnd.nextDouble() * 99.0
        val shift = rnd.nextDouble() * 50.0
        (0 until n).map { _ =>
          val u = rnd.nextDouble()
          shift + scale * (shape match {
            case 0 => u
            case 1 => if (rnd.nextBoolean()) u * 0.2 else 0.8 + u * 0.2
            case 2 => u * u * u
            case 3 => 0.5 + u * 0.5
          })
        }
      }
      val (na, nb) = (50 + rnd.nextInt(400), 50 + rnd.nextInt(400))
      sample(na).map(("g" + i, 0, _)) ++ sample(nb).map(("g" + i, 1, _))
    }
  }

  test("random two-sample fixtures: all divergences bounded, KS <= TVD") {
    val df = fixtures(20260814L).toDF("g", "period", "x")
    val tvd = operators.Drift.histDrift(df)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val ks = operators.Drift.ksTest(df)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(tvd.size == Cases && ks.size == Cases)
    tvd.foreach { case (g, (t, c2)) =>
      assert(t >= 0.0 && t <= 1.0, s"$g: TVD out of [0,1]: $t")
      assert(c2 >= 0.0 && c2 <= 2.0, s"$g: chi2 out of [0,2]: $c2")
      val k = ks(g)
      assert(k >= 0.0 && k <= 1.0, s"$g: KS out of [0,1]: $k")
      // rounding to 6dp on both sides can cross by at most 1e-6
      assert(k <= t + 2e-6, s"$g: KS must not exceed TVD: ks=$k tvd=$t")
    }
  }

  test("period swap leaves every drift statistic unchanged") {
    val rows = fixtures(424242L)
    val fwd = rows.toDF("g", "period", "x")
    val rev = rows.map { case (g, p, x) => (g, 1 - p, x) }.toDF("g", "period", "x")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(key(operators.Drift.histDrift(fwd)) == key(operators.Drift.histDrift(rev)),
      "histDrift must be symmetric under period swap")
    val kf = operators.Drift.ksTest(fwd)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val kr = operators.Drift.ksTest(rev)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(kf == kr, "ksTest must be symmetric under period swap")
  }

  test("categorical drift: random mixes bounded and swap-symmetric") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until Cases).flatMap { i =>
      val k = 2 + rnd.nextInt(8)
      (0 until (100 + rnd.nextInt(300))).map { _ =>
        ("g" + i, rnd.nextInt(2), "c" + rnd.nextInt(k))
      }
    }
    // make sure both periods exist everywhere (tiny fixtures can miss one)
    val padded = rows ++ (0 until Cases).flatMap(i =>
      Seq(("g" + i, 0, "c0"), ("g" + i, 1, "c0")))
    val fwd = padded.toDF("g", "period", "cat")
    val rev = padded.map { case (g, p, c) => (g, 1 - p, c) }.toDF("g", "period", "cat")
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getDouble(4), r.getDouble(5), r.getString(6), r.getDouble(7))).toMap
    val f = stats(operators.Drift.catDrift(fwd))
    assert(f.size == Cases)
    f.foreach { case (g, (t, c2, _, d)) =>
      assert(t >= 0.0 && t <= 1.0 && c2 >= 0.0 && c2 <= 2.0 &&
        d >= 0.0 && d <= 1.0, s"$g: categorical bounds violated: $t $c2 $d")
      assert(d <= 2.0 * t + 2e-6, s"$g: peak |dp| cannot exceed sum |dp|: $d vs $t")
    }
    assert(f == stats(operators.Drift.catDrift(rev)),
      "catDrift must be symmetric under period swap")
  }
}
