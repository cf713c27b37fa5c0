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

  test("segment path equals brute force and the bucket path on a mixed corpus") {
    import spark.implicits._
    // deterministic mix: planted near-dups at lev 1/3/8, a boundary pair
    // at exactly maxDistance, far-apart docs, and short strings whose
    // every pair qualifies
    val rnd = new scala.util.Random(7)
    def word() = ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(3))
    val bases = (0 until 40).map(i => (i * 10L, (0 until 12).map(_ => word()).mkString(" ")))
    val edited = bases.take(10).map { case (id, t) =>
      (id + 1, t.patch(rnd.nextInt(t.length - 9), "QQQ".take(1 + rnd.nextInt(3)), 2)) }
    val shorts = Seq((900L, "ab"), (901L, "xyz"), (902L, ""))
    // exactly-at-threshold pair: 8 substitutions → lev == maxDistance
    val boundary = Seq((950L, "p" * 20), (951L, "p" * 12 + "q" * 8))
    val docs = (bases ++ edited ++ shorts ++ boundary).toDF("doc_id", "text")
    val seg = operators.FuzzyJoin.levenshteinPairsSegment(docs, maxDistance = 8)
      .select("d1", "d2", "lev").as[(Long, Long, Long)].collect().toSet
    val bkt = operators.FuzzyJoin.levenshteinPairs(docs, maxDistance = 8, bucketWidth = 9)
      .select("d1", "d2", "lev").as[(Long, Long, Long)].collect().toSet
    val brute = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.text"), col("b.text")).cast("long"))
      .as[(Long, Long, Long)].collect().filter(_._3 <= 8).toSet
    assert(seg == brute, s"segment path diverged: seg=${seg.size} brute=${brute.size}")
    assert(bkt == brute, s"bucket path diverged: bkt=${bkt.size} brute=${brute.size}")
    assert(brute.exists(_._3 == 8), "boundary distance must be exercised")
    assert(seg.exists(p => p._1 == 900L && p._2 == 901L),
      "short strings pair within K")
  }

  test("segment blocking kills char-stat-clone crowds that defeat count bucketing") {
    import spark.implicits._
    // 40 docs with IDENTICAL length and per-char counts (permutations of
    // one bag of chars) but thoroughly different content — the GenScale
    // cross-copy shape that sent q62 super-linear at sf1 — plus one
    // planted near pair
    val rnd = new scala.util.Random(11)
    val bag = ("abcdefgh" * 8).toSeq
    val docs = ((0 until 40).map { i =>
      (i.toLong, rnd.shuffle(bag).mkString)
    } ++ Seq((100L, "m" * 60 + "n" * 4), (101L, "m" * 60 + "n" * 3 + "o")))
      .toDF("doc_id", "text")
    def cands(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.observedMetrics("fuzzy_candidates").getLong(0)
    }
    val segDf = operators.FuzzyJoin.levenshteinPairsSegment(docs, maxDistance = 4)
    val bktDf = operators.FuzzyJoin.levenshteinPairs(docs, maxDistance = 4, bucketWidth = 5)
    val (segC, bktC) = (cands(segDf), cands(bktDf))
    // count bucketing must enumerate the whole clone crowd (~40²/2);
    // content blocking sees only genuinely-shared segments
    assert(bktC > 500, s"crowd fixture too weak to discriminate: bucket cands=$bktC")
    assert(segC < bktC / 10, s"segment blocking did not kill the crowd: $segC vs $bktC")
    assert(segDf.select("d1", "d2").as[(Long, Long)].collect().toSet
      .contains((100L, 101L)), "planted near pair lost")
  }

  test("bucketWidth <= maxDistance is rejected (would lose pairs)") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](
      operators.FuzzyJoin.levenshteinPairs(docs, maxDistance = 16, bucketWidth = 16)
        .collect())
  }
}
