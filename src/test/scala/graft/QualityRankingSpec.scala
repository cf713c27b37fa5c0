package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 (q57) and quality filtering (q58) on planted fixtures: ranking
  * must prefer term-dense short docs, the filter must flag repetition.
  */
class QualityRankingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bm25 ranks the term-dense doc first and respects k") {
    import spark.implicits._
    val docs = Seq(
      (1L, "data query join data query data"), // dense in all terms
      (2L, "data apple pear plum apple pear plum apple pear plum"),
      (3L, "apple pear plum apple pear plum"), // no terms: unscored
      (4L, "join " + Seq.fill(50)("filler").mkString(" "))) // long, diluted
      .toDF("doc_id", "text")
    val out = operators.Ranking.bm25TopK(docs, Seq("data", "query", "join"), k = 2)
      .collect()
    assert(out.length == 2)
    assert(out.head.getLong(0) == 1L) // densest doc wins
    assert(out.forall(_.getDouble(1) > 0.0))
  }

  test("quality filter flags repetition and keeps clean prose") {
    import spark.implicits._
    val clean = (1 to 30).map(i => s"w$i").mkString(" ") + " the a of and"
    val loop = Seq.fill(17)("spam eggs").mkString(" ") // dup bigrams + hot token
    val short = "too short"
    val docs = Seq((1L, clean), (2L, loop), (3L, short)).toDF("doc_id", "text")
    val rows = operators.Quality.qualityFilter(docs)
      .select(col("doc_id"), col("pass"), col("dup_bigram_frac"), col("top_tok_frac"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(1))
    assert(!rows(2L).getBoolean(1) && rows(2L).getDouble(2) > 0.9)
    assert(!rows(3L).getBoolean(1)) // under min length
  }

  test("tfidf keywords surface group-exclusive tokens and zero out universal ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared apfel apfel apfel shared", "de"),
      (2L, "shared apple apple shared shared", "en"),
      (3L, "shared pomme pomme pomme pomme", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = operators.Ranking.tfidfKeywords(docs, "lang", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(5)))
    // rank-1 keyword per group is its exclusive token, score = tf * ln(3)
    val top = out.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    assert(top == Map("de" -> "apfel", "en" -> "apple", "fr" -> "pomme"))
    // 'shared' occurs in all 3 groups: idf = ln(3/3) = 0 everywhere
    assert(out.filter(_._3 == "shared").forall(_._4 == 0.0))
  }

  test("hashed quality score: deterministic, mean-pooled, bounded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // identical text -> identical score
      (3L, "solo"),
      (4L, "x y"))
      .toDF("doc_id", "text")
    val rows = operators.Quality.hashedQualityScore(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // feature hashing is a pure function of text
    assert(rows(1L) == rows(2L).copy(), s"identical docs diverged: $rows")
    // n_feats = unigrams + bigrams = len + (len-1)
    assert(rows(1L)._1 == 7L && rows(3L)._1 == 1L && rows(4L)._1 == 3L)
    rows.values.foreach { case (n, raw, score, pass) =>
      assert(score == raw.toDouble / n, "mean must be raw/n_feats")
      assert(math.abs(score) <= 500.0, "per-feature weights live in [-500,500]")
      assert(pass == (score > 0.0))
    }
  }

  test("q57/q58 registry entries run on the fixture corpus") {
    val bm = SparkEntry.queries("q57_bm25")(spark, "/root/testdata/sf0.001")
    assert(bm.count() > 0)
    val qf = SparkEntry.queries("q58_quality_filter")(spark, "/root/testdata/sf0.001")
    assert(qf.count() == Tables.t(spark, "/root/testdata/sf0.001", "documents").count())
  }
}
