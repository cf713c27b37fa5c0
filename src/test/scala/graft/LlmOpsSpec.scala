package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** G7 operator semantics beyond the DuckDB oracle: LSH recall against the
  * exact baseline, near-dup ground truth, fingerprint collision behavior. */
class LlmOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("minhash LSH finds exactly the exhaustive near-dup pairs") {
    // q27_dedup_ngram is the exact inverted-index jaccard (no LSH); at
    // tau 0.8 its pairs are ground truth for the LSH variant.
    val lsh = SparkEntry.queries("q27_dedup_minhash")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("q27_dedup_ngram")(spark, sf)
      .where("jac >= 0.8")
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size}")
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
  }

  test("simhash near-dup pairs cover the jaccard near-dups") {
    val sim = SparkEntry.queries("q28_dedup_simhash")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jac = SparkEntry.queries("q27_dedup_minhash")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash(hamming<=8) — the 10x6-bit pigeonhole bound documented in
    // Dedup.scala — should recover nearly all j>=0.98 planted pairs
    val recall = jac.count(sim.contains).toDouble / math.max(jac.size, 1)
    assert(recall >= 0.9, s"simhash recall $recall over ${jac.size} pairs")
  }

  test("ann lsh achieves reasonable recall@5 vs brute force") {
    val brute = SparkEntry.queries("q29_ann_brute")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val lsh = SparkEntry.queries("q29_ann_lsh")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    // single-probe 8-bit LSH on near-orthogonal synthetic vectors: modest
    // recall is expected; this guards determinism and gross regressions
    assert(recall >= 0.2, s"recall@5 $recall")
    assert(lsh == SparkEntry.queries("q29_ann_lsh")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet,
      "LSH ANN must be deterministic")
  }

  test("ivf ann achieves reasonable recall@5 vs brute force and is deterministic") {
    val brute = SparkEntry.queries("q29_ann_brute")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = SparkEntry.queries("q29_ann_ivf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    // probing 4/16 lists of near-orthogonal synthetic vectors: modest
    // recall expected; guards determinism and gross regressions
    assert(recall >= 0.2, s"recall@5 $recall")
    assert(ivf == SparkEntry.queries("q29_ann_ivf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet,
      "IVF ANN must be deterministic")
  }

  test("fingerprint duplicates match exact text duplicates") {
    val fp = SparkEntry.queries("q33_fingerprint")(spark, sf)
      .where("n_same > 1").select("doc_id").collect().map(_.getLong(0)).toSet
    val texts = Tables.t(spark, sf, "documents")
      .groupBy("text").count().where("count > 1")
    import spark.implicits._
    val dupDocs = Tables.t(spark, sf, "documents")
      .join(texts.select("text"), Seq("text"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(fp == dupDocs, s"fp dups ${fp.size} vs text dups ${dupDocs.size}")
  }

  test("exact dedup counts are consistent") {
    val rows: Array[Row] = SparkEntry.queries("q26_dedup_exact")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == r.getAs[Long]("n_uniq") + r.getAs[Long]("n_dups"))
    }
  }
}
