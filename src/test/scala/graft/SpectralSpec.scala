package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spectral semantics beyond the DuckDB oracle: the power iteration
  * must recover a PLANTED dominant direction, produce a unit vector,
  * and improve its eigenvalue estimate monotonically. */
class SpectralSpec extends AnyFunSuite {
  import SparkTestSession._

  test("recovered component is unit-norm and eig grows with iterations") {
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val samp = e.orderBy(md5(col("vec_id").cast("string")).asc_nulls_last,
      col("vec_id").asc_nulls_last).limit(300)
    val v3 = operators.Spectral.topComponent(spark, samp, iters = 3).collect()
    val norm2 = v3.map(_.getAs[Double]("loading")).map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-6, s"component not unit norm: $norm2")
    val eig1 = operators.Spectral.topComponent(spark, samp, iters = 1)
      .head().getAs[Double]("eig")
    val eig3 = v3.head.getAs[Double]("eig")
    assert(eig3 >= eig1 - 1e-9,
      s"power iteration regressed: ||Cv|| $eig1 -> $eig3")
  }

  test("a planted dominant direction is recovered (|cos| > 0.9)") {
    import spark.implicits._
    // u = (1,1,...,1)/8; x_k = s_k*u*4 + deterministic small noise
    val planted = (0 until 200).map { k =>
      val s = if (k % 2 == 0) 1.0 else -1.0
      val noise = (0 until 64).map(d =>
        (((k * 31 + d * 17) % 19) - 9) / 90.0f)
      (k.toLong, (0 until 64).map(d =>
        (s * 0.5 + noise(d)).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    val v = operators.Spectral.topComponent(spark, planted, iters = 3)
      .collect().sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("loading"))
    val u = Array.fill(64)(1.0 / 8)
    val cos = v.zip(u).map { case (a, b) => a * b }.sum /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(u.map(x => x * x).sum))
    assert(math.abs(cos) > 0.9, s"planted direction not recovered: cos=$cos")
  }

  test("projection aggregate covers the corpus") {
    val rows = SparkEntry.queries("q101_pca_project")(spark, sf).collect()
    val total = Tables.t(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    assert(rows.map(_.getAs[Int]("label")).distinct.length == rows.length)
  }

  test("fit-once/project-many: a persisted model round-trips the fit " +
      "bit-for-bit and the project half reuses it") {
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val samp = e.orderBy(md5(col("vec_id").cast("string")).asc_nulls_last,
      col("vec_id").asc_nulls_last).limit(300)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pca_spec").toString
    operators.Spectral.fitComponent(spark, samp, dir)
    val direct = operators.Spectral.topComponent(spark, samp).collect()
      .map(r => (r.getAs[Int]("pos"),
        r.getAs[Double]("loading"), r.getAs[Double]("eig"))).sorted
    val loaded = operators.Spectral.loadComponent(spark, dir).collect()
      .map(r => (r.getAs[Int]("pos"),
        r.getAs[Double]("loading"), r.getAs[Double]("eig"))).sorted
    assert(loaded.sameElements(direct),
      "parquet model must round-trip the fit exactly")
    // the probe half reads ONLY the model: its plan never touches the
    // sample covariance / power-iteration lineage
    val proj = operators.Spectral.projectComponent(
      spark, Tables.t(spark, sf, "embeddings"), dir)
    val plan = proj.queryExecution.optimizedPlan.toString
    assert(!plan.contains("posexplode"),
      "project half must not re-derive the fit (no covariance melt in plan)")
    assert(proj.collect().map(_.getAs[Long]("n_vecs")).sum ==
      Tables.t(spark, sf, "embeddings").count())
  }

  test("deep iteration counts stay analyzable (plan-growth guard)") {
    // each un-anchored round doubles the lazy plan (w referenced
    // directly and via the nrm broadcast) — at iters=12 that is 2^12
    // subtree copies without the every-4th-round re-anchor. The guard
    // must keep this both fast and correct: a converged power iteration
    // is idempotent, so deep iteration preserves unit norm.
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val samp = e.orderBy(md5(col("vec_id").cast("string")).asc_nulls_last,
      col("vec_id").asc_nulls_last).limit(100)
    val v = operators.Spectral.topComponent(spark, samp, iters = 12).collect()
    assert(v.length == 64)
    val norm2 = v.map(_.getAs[Double]("loading")).map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-6, s"component not unit norm: $norm2")
  }
}
