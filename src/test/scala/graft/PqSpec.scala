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
