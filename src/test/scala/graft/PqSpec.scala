package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization semantics beyond the DuckDB oracle: the
  * compression contract (8 codes/vector from 16-codeword subspace
  * books), reconstruction fidelity, deterministic retraining, and ADC
  * recall against the exact brute-force baseline. */
class PqSpec extends AnyFunSuite {
  import SparkTestSession._

  test("codes are the compression contract: 8 per vector, bounded codebooks") {
    val codes = SparkEntry.queries("q98_pq_codes")(spark, sf).collect()
    assert(codes.map(_.getAs[Int]("sub")).toSet ==
      (0 until operators.Pq.NSub).toSet)
    codes.groupBy(_.getAs[Int]("sub")).foreach { case (s, rows) =>
      assert(rows.length <= operators.Pq.NCode,
        s"sub $s uses ${rows.length} codewords")
    }
    val total = Tables.t(spark, sf, "embeddings").count()
    codes.groupBy(_.getAs[Int]("sub")).foreach { case (s, rows) =>
      assert(rows.map(_.getAs[Long]("n_vecs")).sum == total,
        s"sub $s codes don't cover the corpus")
    }
  }

  test("ADC ranking achieves reasonable recall@5 vs exact brute force") {
    val brute = SparkEntry.queries("q29_ann_brute")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val pq = SparkEntry.queries("q98_ann_pq")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = brute.count(pq.contains).toDouble / brute.size
    info(f"pq adc recall@5: $recall%.2f")
    // 16 codewords x 8 subspaces on near-orthogonal random 64-d vectors
    // is the hard case for PQ (no cluster structure to exploit); the
    // floor guards against a broken encode, not a tuned one
    assert(recall >= 0.2, s"recall@5 $recall")
  }

  test("reconstruction preserves direction (mean cosine to source)") {
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val samp = e.orderBy(md5(col("vec_id").cast("string")).asc_nulls_last,
      col("vec_id").asc_nulls_last).limit(320)
    val cb = operators.Pq.trainCodebook(spark, samp)
    val recon = operators.Pq.reconstruct(operators.Pq.encode(e, cb), cb)
    val meanCos = e.as("a")
      .join(recon.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select(graft.functions.VectorOps
        .cosineFast(spark, "a.embedding", "b.embedding").as("c"))
      .agg(avg(col("c"))).head().getDouble(0)
    info(f"mean reconstruction cosine: $meanCos%.3f")
    assert(meanCos > 0.3, s"reconstruction lost the signal: $meanCos")
    // and the reconstruction is full-width
    assert(recon.select(size(col("embedding"))).distinct().head().getInt(0) == 64)
  }

  test("ivf+pq composition: results come from probed lists, scored by ADC") {
    val corpus = Tables.t(spark, sf, "embeddings")
    val got = SparkEntry.queries("q102_ann_ivfpq")(spark, sf).collect()
    assert(got.nonEmpty)
    // (1) every result pair must lie inside the coarse quantizer's
    // probed candidate lists — the same candidate sets q29_ivf_cands
    // digests for the driver (PQ only re-ranks within them)
    val candAgg = operators.Similarity
      .annIvfCandidates(spark, corpus, col("vec_id") < 10).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("min_cand"), r.getAs[Long]("max_cand"), r.getAs[Long]("n_cands"))).toMap
    got.foreach { r =>
      val (mn, mx, _) = candAgg(r.getAs[Long]("q_id"))
      val v = r.getAs[Long]("vec_id")
      assert(v >= mn && v <= mx,
        s"result $v outside the candidate id range of query ${r.get(0)}")
    }
    // (2) the ADC scores are the PQ-reconstruction cosines, bit-exact
    val e = corpus.select(col("vec_id"), col("embedding"))
    val cb = operators.Pq.trainCodebook(spark,
      e.orderBy(md5(col("vec_id").cast("string")).asc_nulls_last,
        col("vec_id").asc_nulls_last).limit(1280))
    val recon = operators.Pq.reconstruct(operators.Pq.encode(e, cb), cb)
    val adc = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .join(recon.withColumnRenamed("vec_id", "cand"), expr("cand <> q_id"))
      .select(col("q_id"), col("cand"), round(graft.functions.VectorOps
        .cosineFast(spark, "q_emb", "embedding"), 9).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      assert(adc(key) == r.getAs[Double]("cos"),
        s"ADC score mismatch for $key: ${adc(key)} vs ${r.getAs[Double]("cos")}")
    }
    // (3) deterministic
    val again = SparkEntry.queries("q102_ann_ivfpq")(spark, sf).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("retraining is deterministic (codebook bit-identical)") {
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val samp = e.orderBy(md5(col("vec_id").cast("string")).asc_nulls_last,
      col("vec_id").asc_nulls_last).limit(320)
    def snap() = operators.Pq.trainCodebook(spark, samp)
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Float](2).toList)).toSet
    assert(snap() == snap(), "two trainings diverged")
  }
}
