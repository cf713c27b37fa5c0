package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Pipeline, Similarity, TextAnalysis}

/** The parameterized operator API from a library consumer's seat: custom
  * DataFrames (not the fixture tables), non-default thresholds.
  */
class LibraryApiSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docsDf = {
    import spark.implicits._
    // three exact near-dup pairs (one token changed) + unrelated docs
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val docs = Seq(
      (1L, "en", base),
      (2L, "en", base.replace("today", "tonight")),
      (3L, "en", "completely different text about spark shuffles and exchanges and joins"),
      (4L, "en", base.replace("quick", "rapid")),
      (5L, "en", "another unrelated document that talks about parquet files and columns"),
      (6L, "en", base))
    docs.toDF("doc_id", "lang", "text")
  }

  test("minhashPairs finds planted near-dups at a custom threshold") {
    val pairs = Dedup.minhashPairs(docsDf, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1-2, 1-4, 2-4 (one-token edits) and 1-6 / 2-6 / 4-6 (6 = copy of 1)
    assert(pairs.contains((1L, 6L)), s"exact dup missed: $pairs")
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)),
      s"near dups missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 5L || p._2 == 5L),
      s"unrelated docs must not pair: $pairs")
  }

  test("containmentPairs finds the embedded quote that Jaccard structurally misses") {
    import spark.implicits._
    val core = (1 to 30).map(i => s"core$i").mkString(" ")
    val filler = (1 to 170).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, "en", core),                    // the short original
      (2L, "en", core + " " + filler),     // quotes ALL of doc 1 inside 6x the text
      (3L, "en", (1 to 50).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val pairs = operators.Dedup.containmentPairs(docs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(4), r.getDouble(5))).toMap
    val (cont, jac) = pairs((1L, 2L))
    assert(cont == 1.0, s"full embedding must read containment 1: $pairs")
    assert(jac < 0.2, s"the same pair's Jaccard is structurally small: $pairs")
    // and the symmetric detector at the same bar indeed cannot see it
    val jpairs = operators.Dedup.ngramJaccardPairs(docs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jpairs.contains((1L, 2L)),
      s"premise check: Jaccard@0.9 must miss the embedded quote: $jpairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated doc must not pair: $pairs")
  }

  test("containmentKeep collapses a containment chain and keeps the superset") {
    import spark.implicits._
    val core = (1 to 30).map(i => s"core$i").mkString(" ")
    val mid = core + " " + (1 to 20).map(i => s"mid$i").mkString(" ")
    val full = mid + " " + (1 to 40).map(i => s"tail$i").mkString(" ")
    // the SUPERSET deliberately carries the HIGHEST id: a min-id
    // election (q55's, right for symmetric near-dups) would keep the
    // FRAGMENT 5 and lose text — the size election must keep 7
    val docs = Seq(
      (5L, "en", core), (6L, "en", mid), (7L, "en", full),
      (8L, "en", (1 to 60).map(i => s"solo$i").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val got = operators.Clusters.containmentKeep(docs, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(got(7L) == ((5L, true)), s"the largest doc must be kept: $got")
    assert(got(5L) == ((5L, false)) && got(6L) == ((5L, false)),
      s"contained docs must cluster under min-id label and be dropped: $got")
    assert(got(8L) == ((8L, true)), s"singleton keeps itself: $got")
  }

  test("simhashPairs at a strict hamming threshold keeps the exact dup") {
    val strict = Dedup.simhashPairs(docsDf, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 6L)), s"only the exact copy at hamming 0: $strict")
  }

  test("annBruteTopK ranks a custom corpus against custom queries") {
    import spark.implicits._
    // 1-hot corners plus a near-copy of vector 0
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val top = Similarity.annBruteTopK(spark, corpus, queries, k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(top.toSeq == Seq((1, 1L), (2, 2L)), s"ranking wrong: ${top.toSeq}")
  }

  test("embedCosinePairs honors custom nTables/bitsPerTable/maxBucket on a custom frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val base = vec()
    val near = base.map(v => v + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
    val emb = (Seq((1L, base), (2L, near)) ++ (3L to 20L).map(i => (i, vec())))
      .toDF("vec_id", "embedding")
    // non-default banding: 4 tables × 8 bits. The planted pair sits at
    // cos ≈ 0.999, so per-table collision is ~0.92 and the 4-table miss
    // probability ~4e-5 — deterministic planes make the run repeatable.
    // The verify step is exact, so the random background cannot produce
    // false pairs at 0.95 regardless of banding parameters.
    val pairs = Dedup.embedCosinePairs(spark, emb, threshold = 0.95,
      nTables = 4, bitsPerTable = 8, maxBucket = 16)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected exactly the planted pair: $pairs")
  }

  test("corpusClean keeps monotonically fewer docs as the threshold rises") {
    def kept(t: Double): Long =
      Pipeline.corpusClean(docsDf, qualityThreshold = t)
        .agg(coalesce(sum("n_docs"), lit(0L))).collect()(0).getLong(0)
    assert(kept(0.0) >= kept(0.4), "higher bar cannot keep more docs")
    // threshold 0 keeps everything except the dedup'd exact copy
    assert(kept(0.0) == 5L, s"expected 5 kept (6 minus 1 dup): ${kept(0.0)}")
  }

  test("contaminationBuckets flags docs contained in the benchmark set") {
    import graft.operators.Decontam
    // doc 1 (15 tokens -> 13 distinct 3-shingles) is the benchmark;
    // doc 6 is its exact copy (containment 1.0, bucket 10); doc 2 edits
    // the LAST token (1 changed shingle, 12/13 -> bucket 9); doc 4 edits
    // token 1 (2 changed shingles, 11/13 -> bucket 8); docs 3/5 share
    // nothing (bucket 0)
    val out = Decontam.contaminationBuckets(docsDf, col("doc_id") === 1)
    val buckets = out.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets == Map(10 -> 1L, 9 -> 1L, 8 -> 1L, 0 -> 2L),
      s"bucket profile: $buckets")
    // the benchmark shingle set must join via broadcast — the corpus
    // side must never shuffle by shingle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$plan")
  }

  test("stratifiedMix applies per-stratum rates and the quota cap") {
    import graft.operators.Decontam
    val all = Decontam.stratifiedMix(docsDf,
      Map("en" -> 100), defaultRate = 0, quota = 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(all == Map("en" -> 6L), s"rate 100 must keep every doc: $all")
    val capped = Decontam.stratifiedMix(docsDf,
      Map("en" -> 100), defaultRate = 0, quota = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(capped == Map("en" -> 2L), s"quota 2 must cap the stratum: $capped")
    val none = Decontam.stratifiedMix(docsDf,
      Map.empty, defaultRate = 0, quota = 100).count()
    assert(none == 0L, "rate 0 must keep nothing")
  }

  test("temperatureMix upsamples rare sources and respects the budget") {
    import graft.operators.Mixing
    import spark.implicits._
    // 200 docs from a dominant source, 10 from a rare one
    val docs = ((1 to 200).map(i => (i.toLong, "big", s"tok$i words here")) ++
      (201 to 210).map(i => (i.toLong, "small", s"tok$i words here")))
      .toDF("doc_id", "source", "text")
    val out = Mixing.temperatureMix(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nBig, thrBig, keptBig) = out("big")
    val (nSmall, thrSmall, keptSmall) = out("small")
    assert(nBig == 200L && nSmall == 10L)
    // α=0.5 gives the rare source rate ∝ n^-0.5: B*p_small/n_small =
    // 105*0.183/10 ≈ 1.9 — capped at 1.0, so ALL small docs survive
    assert(thrSmall == 1000000L && keptSmall == 10L,
      s"rare source must be fully kept: $out")
    // dominant source is downsampled below its share
    assert(thrBig < 1000000L && keptBig < 200L,
      s"dominant source must be subsampled: $out")
    // global budget N div 2 = 105 holds up to hash-sampling variance
    assert(keptBig + keptSmall <= 126L, s"budget blown: $out")
  }

  test("langId works on any conforming frame") {
    val out = TextAnalysis.langId(docsDf)
    assert(out.count() == 6)
    assert(out.columns.contains("pred_lang"))
  }
}
