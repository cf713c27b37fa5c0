package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy self-join: document pairs within a Levenshtein
  * threshold — the character-level near-dup detector that catches small
  * in-place edits the token-set methods (q27/q28) see only as whole-
  * token substitutions.
  *
  * Blocking is PROVABLY lossless, not probabilistic: edit distance
  * lower-bounds nothing less than the length difference
  * (|len(a) − len(b)| ≤ lev(a, b)), so with bucket width W > K two
  * docs within distance K differ by at most one length bucket. The
  * left side is replicated to buckets {b−1, b, b+1}; the right side
  * keeps its base bucket; the equi-join on bucket then sees every
  * qualifying pair EXACTLY once (the right doc's base bucket is a
  * single value), so no post-join distinct is needed.
  *
  * Scale shape: one shuffle on the bucket key; the quadratic candidate
  * stream lives inside the join tasks, pre-filtered by the cheap
  * |len diff| ≤ K residual before the O(len²) `levenshtein` runs, and
  * only matches are emitted. Crowded length buckets are the hot spot
  * (candidates ∼ Σ_b 3·n_b²); production corpora sub-block by adding a
  * cheap partition key (lang, source) to `blockCols` — the same
  * crowd-splitting discipline as the salted dedup buckets
  * (CelebornPartitionUtil.java:60-100) — or shrink `bucketWidth`
  * toward K+1.
  */
object FuzzyJoin {

  /** PUBLIC API — all (doc_id) pairs of (doc_id, text) within edit
    * distance `maxDistance`. `bucketWidth` must exceed `maxDistance`
    * (lossless-blocking invariant, checked). `blockCols` optionally
    * adds exact-match columns to the blocking key. */
  def levenshteinPairs(docs: DataFrame, maxDistance: Int = 10,
      bucketWidth: Int = 11, blockCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > maxDistance,
      "bucketWidth must exceed maxDistance or adjacent-bucket blocking loses pairs")
    val base = docs.select(
      (col("doc_id") +: col("text") +: blockCols.map(col)): _*)
      .withColumn("bk", expr(s"length(text) div $bucketWidth"))
    val left = base
      .withColumn("bk", explode(expr("array(bk - 1, bk, bk + 1)")))
      .select((col("bk") +: col("doc_id").as("d1") +: col("text").as("t1")
        +: blockCols.map(c => col(c).as(s"${c}_l"))): _*)
    val right = base
      .select((col("bk") +: col("doc_id").as("d2") +: col("text").as("t2")
        +: blockCols.map(c => col(c).as(s"${c}_r"))): _*)
    val keyEq = blockCols
      .map(c => col(s"${c}_l") === col(s"${c}_r"))
      .foldLeft(left("bk") === right("bk"))(_ && _)
    // levenshtein's threshold form runs the banded O(k·n) DP and
    // early-aborts to -1 past the bound — the candidate stream is
    // dominated by non-matches, so this is where the join's time goes.
    left.join(right, keyEq
        && col("d1") < col("d2")
        && abs(length(col("t1")) - length(col("t2"))) <= maxDistance
        && levenshtein(col("t1"), col("t2"), maxDistance) >= 0)
      .select(col("d1"), col("d2"),
        levenshtein(col("t1"), col("t2"), maxDistance).cast("long").as("lev"))
      .orderBy(col("d1").asc_nulls_last, col("d2").asc_nulls_last,
        col("lev").asc_nulls_last)
  }

  private def q62(s: SparkSession, dir: String): DataFrame =
    levenshteinPairs(Tables.t(s, dir, "documents"))

  /** Independent oracle: brute-force all pairs — no blocking replay. */
  private val q62Sql =
    """SELECT a.doc_id AS d1, b.doc_id AS d2,
      |  levenshtein(a.text, b.text)::BIGINT AS lev
      |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
      |WHERE abs(length(a.text) - length(b.text)) <= 10
      |  AND levenshtein(a.text, b.text) <= 10
      |ORDER BY d1 ASC NULLS LAST, d2 ASC NULLS LAST, lev ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q62_fuzzy_join", q62, Some(q62Sql)))
}
