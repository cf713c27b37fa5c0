package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Levenshtein fuzzy join (q62): blocked result must equal brute force
  * (lossless blocking), including pairs that straddle a bucket boundary.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("blocked join equals brute force, across bucket boundaries") {
    import spark.implicits._
    // lengths 15 and 17 straddle the width-16 boundary (buckets 0 and 1)
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaa"),        // 15 chars
      (2L, "aaaaaaaaaaaaaaaxy"),      // 17 chars, lev 2 from doc 1
      (3L, "bbbbbbbbbbbbbbbbb"),      // 17 chars, far from both
      (4L, "aaaaaaaaaaaaaaaxyz"))     // 18 chars, lev 1 from doc 2
      .toDF("doc_id", "text")
    val blocked = operators.FuzzyJoin.levenshteinPairs(docs, maxDistance = 10, bucketWidth = 16)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val brute = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id")
          && levenshtein(col("a.text"), col("b.text")) <= 10)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(blocked == brute && blocked.contains((1L, 2L)) && blocked.contains((2L, 4L)))
  }

  test("q62 finds exactly the fixture's planted same-lang near-dup pairs") {
    // registered q62 blocks on lang (production discipline); the sf0.01
    // fixture plants 6 same-lang pairs, all at lev 4
    val out = SparkEntry.queries("q62_fuzzy_join")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.length == 6)
    assert(out.forall(_.getLong(2) == 4L))
  }

  test("lang blocking bounds the candidate stream on a crowded bucket") {
    import spark.implicits._
    val langs = Seq("en", "de", "zh")
    // 60 docs, all length 40 → one length bucket (the crowd)
    val docs = (0 until 60).map { i =>
      val ch = ('a' + i % 7).toChar.toString
      (i.toLong, ("x" * 30) + ch * 10, langs(i % 3))
    }.toDF("doc_id", "text", "lang")
    def run(cols: Seq[String]): (Set[(Long, Long)], Long) = {
      val df = operators.FuzzyJoin.levenshteinPairs(
        docs, maxDistance = 5, bucketWidth = 6, blockCols = cols)
      val rows = df.select("d1", "d2").as[(Long, Long)].collect().toSet
      val cand = df.queryExecution.observedMetrics("fuzzy_candidates").getLong(0)
      (rows, cand)
    }
    val (unblockedPairs, unblockedCand) = run(Nil)
    val (blockedPairs, blockedCand) = run(Seq("lang"))
    val brute = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id") && col("a.lang") === col("b.lang")
          && levenshtein(col("a.text"), col("b.text")) <= 5)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(blockedPairs == brute)                    // still lossless within blocks
    assert(blockedPairs.subsetOf(unblockedPairs))
    assert(blockedCand * 2 <= unblockedCand,         // crowd split ~3 ways
      s"blocking should shrink candidates: $blockedCand vs $unblockedCand")
    // the char-count guard already pruned far-apart texts pre-DP
    assert(unblockedCand < 60L * 59 / 2)
  }

  test("blockCols restricts pairs to exact-matching block keys") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text here", "en"), (2L, "same text hers", "en"),
      (3L, "same text herz", "de")) // lev 1-2 from both, but other lang
      .toDF("doc_id", "text", "lang")
    val pairs = operators.FuzzyJoin
      .levenshteinPairs(docs, maxDistance = 5, blockCols = Seq("lang"))
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // cross-lang pairs blocked out
  }

  test("bucketWidth <= maxDistance is rejected (would lose pairs)") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](
      operators.FuzzyJoin.levenshteinPairs(docs, maxDistance = 16, bucketWidth = 16)
        .collect())
  }
}
