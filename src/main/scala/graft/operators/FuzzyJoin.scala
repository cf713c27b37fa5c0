package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy self-join: document pairs within a Levenshtein
  * threshold — the character-level near-dup detector that catches small
  * in-place edits the token-set methods (q27/q28) see only as whole-
  * token substitutions.
  *
  * Blocking is PROVABLY lossless, not probabilistic: edit distance is
  * lower-bounded by the length difference (|len(a) − len(b)| ≤
  * lev(a, b)), so with bucket width W > K two docs within distance K
  * differ by at most one length bucket. One side is replicated to
  * buckets {b, b+1}; the other keeps its base bucket; a pair in the
  * same bucket is counted once via id order, a pair straddling a
  * boundary once via bucket order (only the lower doc replicates up) —
  * every qualifying pair is seen EXACTLY once with ×2 (not ×3)
  * replication and no post-join distinct.
  *
  * Candidate pruning before the O(k·n) DP, both lossless:
  *  1. |len(a) − len(b)| ≤ K (the bucketing residual);
  *  2. per-character count bounds: a single edit changes the count of
  *     any fixed character by at most 1, so lev(a, b) ≥
  *     |count_c(a) − count_c(b)| for every c. Counts for a few frequent
  *     anchor characters are precomputed once per doc (linear scan) and
  *     compared with integer ops per candidate — orders of magnitude
  *     cheaper than the banded DP they guard.
  *
  * Scale shape: one shuffle on the blocking key; candidates ∼ Σ_b n_b²
  * over blocks, so block population is the scale knob. The registered
  * q62 blocks on (lang, length-bucket) — the production discipline: a
  * 100 TB corpus sub-blocks by cheap exact keys (lang, source) exactly
  * like the salted dedup buckets split crowds
  * (celeborn: CelebornPartitionUtil.java:60-100). The candidate count
  * is surfaced per-run via `observe` (metric `fuzzy_candidates`), so a
  * crowding cliff shows up in metrics instead of silently in runtime.
  */
object FuzzyJoin {

  /** Characters whose per-doc counts gate the DP (space + the most
    * frequent letters in latin-script corpora; harmless no-ops for
    * scripts where they are rare). */
  private val AnchorChars = Seq(' ', 'e', 'a', 'o')

  /** PUBLIC API — all (doc_id) pairs of (doc_id, text) within edit
    * distance `maxDistance`. `bucketWidth` must exceed `maxDistance`
    * (lossless-blocking invariant, checked). `blockCols` adds exact-
    * match columns to the blocking key — strongly recommended at scale
    * (candidates grow with the square of block population).
    *
    * The blocking key is TWO-dimensional: (length bucket, 'e'-count
    * bucket). Both dimensions are lossless for the same reason — one
    * edit changes the length and any fixed character's count by at most
    * 1, so lev ≤ K < bucketWidth keeps a pair within one bucket of each
    * other in BOTH dimensions. Dim 1 keeps the up-only ×2 replication
    * with the bucket-order once-rule; dim 2 replicates left to all
    * three neighbor buckets (×3) so mixed-sign deltas like (+1, −1)
    * still meet (up-only in both dims would lose them), and the
    * once-rule stays driven by dim 1 alone. Net ×6 left replication
    * buys a multiplicative block-population split — the r7 sf1 scaling
    * run measured q62 going super-linear (48× at 10× data) on the 1-D
    * key because every (lang, length) crowd grew 10×; the second
    * dimension restores ~linear candidate growth without touching
    * exactness (the brute-force oracle proves it). */
  def levenshteinPairs(docs: DataFrame, maxDistance: Int = 10,
      bucketWidth: Int = 11, blockCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > maxDistance,
      "bucketWidth must exceed maxDistance or adjacent-bucket blocking loses pairs")
    val anchors = AnchorChars.zipWithIndex.map { case (ch, i) =>
      (length(col("text")) - length(replace(col("text"), lit(ch.toString), lit("")))).as(s"ac$i")
    }
    val base = docs.select(
      (col("doc_id") +: col("text") +: blockCols.map(col)) ++ anchors: _*)
      .withColumn("bk", expr(s"length(text) div $bucketWidth"))
      // dim 2: 'e'-count bucket (ac1 is the 'e' anchor count)
      .withColumn("bk2", expr(s"ac1 div $bucketWidth"))
    def side(tag: String)(c: String): Column = col(c).as(s"${c}_$tag")
    val sideCols = Seq("doc_id", "text", "bk", "bk2") ++
      blockCols ++ AnchorChars.indices.map(i => s"ac$i")
    // dim 1: lower side replicates up, jk ∈ {bk, bk+1};
    // dim 2: left covers all neighbors, jk2 ∈ {bk2−1, bk2, bk2+1}
    val left = base
      .withColumn("jk", explode(expr("array(bk, bk + 1)")))
      .withColumn("jk2", explode(expr("array(bk2 - 1, bk2, bk2 + 1)")))
      .select(col("jk") +: col("jk2") +: sideCols.map(side("l")): _*)
    val right = base.select(sideCols.map(side("r")): _*)
    val keyEq = blockCols
      .map(c => col(s"${c}_l") === col(s"${c}_r"))
      .foldLeft(left("jk") === right("bk_r") && left("jk2") === right("bk2_r"))(_ && _)
    // each pair exactly once: same bucket → id order; adjacent → bucket order
    val once = (col("bk_l") === col("bk_r") && col("doc_id_l") < col("doc_id_r")) ||
      col("bk_l") === col("bk_r") - 1
    val cheap = AnchorChars.indices
      .map(i => abs(col(s"ac${i}_l") - col(s"ac${i}_r")) <= maxDistance)
      .foldLeft(abs(length(col("text_l")) - length(col("text_r"))) <= maxDistance)(_ && _)
    left.join(right, keyEq && once && cheap)
      .observe("fuzzy_candidates", count(lit(1)).as("n_candidates"))
      // banded O(k·n) DP, early-abort to -1 past the bound; runs once
      // per surviving candidate, after every cheap guard
      .withColumn("lev", levenshtein(col("text_l"), col("text_r"), maxDistance).cast("long"))
      .filter(col("lev") >= 0)
      .select(least(col("doc_id_l"), col("doc_id_r")).as("d1"),
        greatest(col("doc_id_l"), col("doc_id_r")).as("d2"), col("lev"))
      .orderBy(col("d1").asc_nulls_last, col("d2").asc_nulls_last,
        col("lev").asc_nulls_last)
  }

  /** PUBLIC API — same contract as [[levenshteinPairs]], but candidates
    * come from SEGMENT-SIGNATURE (PassJoin-style) content blocking
    * instead of count-statistics buckets. Pigeonhole: K edits cannot
    * touch all K+1 segments of a partition of `b`, so some segment of
    * `b` appears VERBATIM in `a` — at a position whose shift δ obeys
    * |δ| + |ΔL − δ| ≤ K (edits before the segment produce δ, edits
    * after it produce the rest of the length delta ΔL). The probe side
    * therefore enumerates, per slot, only the substrings inside that
    * window (≈ K² per doc, the published bound), and candidates are an
    * EQUI-join on (slot, segment length, segment hash) — content-based,
    * so statistically-identical crowds that defeat count bucketing
    * (the r7 sf1 run: 9 char-stat-clone copies per doc → 48× runtime)
    * produce no candidates unless they genuinely share a segment.
    * Algorithm: Li/Deng/Feng/Wang, "PassJoin" (PVLDB 5(3), 2011) —
    * public literature, re-expressed as DataFrame ops.
    *
    * Orientation: the probe is the longer side (La > Lb, ties by id),
    * so each unordered pair is generated from exactly one direction;
    * `.distinct()` collapses multi-segment matches. Hash collisions
    * only ADD candidates (killed by the DP verify) — never lose pairs.
    * Strings shorter than K+1 get empty segments whose probes match all
    * other empty segments in the block — correct (tiny strings are
    * genuinely all within distance K) and surfaced by the same
    * `fuzzy_candidates` metric. */
  def levenshteinPairsSegment(docs: DataFrame, maxDistance: Int = 10,
      blockCols: Seq[String] = Nil): DataFrame = {
    val k = maxDistance
    val p = k + 1
    val base = docs.select(
      col("doc_id") +: col("text") +: blockCols.map(col): _*)
      .withColumn("len", length(col("text")))
    // index side: each doc's own K+1 segments (slot, length, hash);
    // `div` everywhere — SQL `/` is double division
    val idx = base
      .withColumn("slot_i", explode(expr(s"sequence(0, $k)")))
      .select(blockCols.map(c => col(c).as(s"${c}_i")) ++ Seq(
        col("doc_id").as("id_i"), col("len").as("len_i"), col("slot_i"),
        expr(s"xxhash64(substring(text, ((slot_i * len) div $p) + 1, " +
          s"((slot_i + 1) * len) div $p - (slot_i * len) div $p))").as("h_i"),
        expr(s"((slot_i + 1) * len) div $p - (slot_i * len) div $p").as("sl_i")): _*)
    // probe side: for every partner length lb ∈ [len−K, len] and slot,
    // the multi-match-aware start window. TWO bounds, intersected, both
    // lossless for the FIRST untouched segment (which always exists):
    //   |δ| + |ΔL − δ| ≤ K   (edits before/after split the budget), and
    //   δ ∈ [ΔL − (K−slot), ΔL + (K−slot)]  (each of the `slot` earlier
    //   segments is touched, so ≤ K−slot edits remain after this one).
    // Execution shape, chosen by measurement at sf1 (alternatives were
    // 4-10× slower): (1) explode SKINNY rows only — doc_id/len/slot/
    // sl/q, never text: exploding text-carrying rows materializes ~20×
    // the corpus in row copies before anything runs; (2) dedupe the
    // window overlap on the skinny rows (the per-(slot,sl) windows of
    // neighboring lb values mostly coincide — ~4.5× reduction);
    // (3) join the text back by doc_id and hash each surviving
    // substring exactly once. (A higher-order-function variant that
    // dedupes and hashes inside per-doc arrays avoids the join but
    // falls out of whole-stage codegen — measured slower than the
    // extra exchange.)
    val probe = base.select(col("doc_id"), col("len"))
      .withColumn("slot", explode(expr(s"sequence(0, $k)")))
      .withColumn("lb", explode(expr(s"sequence(greatest(len - $k, 0), len)")))
      .withColumn("st", expr(s"(slot * lb) div $p"))
      .withColumn("sl", expr(s"((slot + 1) * lb) div $p - st"))
      .withColumn("dl", col("len") - col("lb"))
      .withColumn("q", explode(expr(
        s"""sequence(st + greatest(dl - ($k - slot), -(($k - dl) div 2) - 1),
           |         st + least(dl + ($k - slot), dl + ($k - dl) div 2 + 1))""".stripMargin)))
      .where(col("q") >= 0 && col("q") + col("sl") <= col("len"))
      .select(col("doc_id"), col("len"), col("slot"), col("sl"), col("q"))
      .dropDuplicates(Seq("doc_id", "slot", "sl", "q"))
      .join(base, Seq("doc_id", "len"))
      .withColumn("h", expr("xxhash64(substring(text, q + 1, sl))"))
      .select(blockCols.map(col) ++ Seq(col("doc_id").as("id_p"),
        col("len").as("len_p"), col("slot"), col("sl"), col("h")): _*)
    val keyEq = blockCols
      .map(c => col(c) === col(s"${c}_i"))
      .foldLeft(col("slot") === col("slot_i") &&
        col("sl") === col("sl_i") && col("h") === col("h_i"))(_ && _)
    // longer side probes; ties broken by id — each pair exactly once
    val once = col("len_p") > col("len_i") ||
      (col("len_p") === col("len_i") && col("id_p") < col("id_i"))
    // shuffle-hash on the (small, K+1-rows-per-doc) index side: size
    // estimates for the exploded probe subtree are unreliable and AQE
    // once picked BuildLeft-broadcast of the 16M-row probe (139 s);
    // partition-wise hash build on idx is the scale-correct plan
    val cands = probe.join(idx.hint("shuffle_hash"), keyEq && once &&
        col("len_p") - col("len_i") <= k)
      .select(col("id_p"), col("id_i")).distinct()
      .observe("fuzzy_candidates", count(lit(1)).as("n_candidates"))
    // verify: join texts back by id (candidates are few; the heavy
    // signature join above never carried text), then the banded DP.
    // r16: both verify joins are hinted shuffle-hash with cands as the
    // build side — the text frames are corpus-sized BY CONSTRUCTION,
    // and byte-threshold broadcast decisions are unsafe for them: the
    // replicated-corpus text compresses ~30x, so an AQE side measured
    // under the compressed threshold materialized a 4.3 GiB broadcast
    // at sf100 (r16f: 93-task collect blew driver maxResultSize).
    // Partition-wise hash build on the candidate pairs is the plan
    // that holds at any scale.
    val t1 = base.select(col("doc_id").as("id_p"), col("text").as("text_l"))
    val t2 = base.select(col("doc_id").as("id_i"), col("text").as("text_r"))
    cands.hint("shuffle_hash").join(t1, "id_p")
      .hint("shuffle_hash").join(t2, "id_i")
      .withColumn("lev", levenshtein(col("text_l"), col("text_r"), k).cast("long"))
      .filter(col("lev") >= 0)
      .select(least(col("id_p"), col("id_i")).as("d1"),
        greatest(col("id_p"), col("id_i")).as("d2"), col("lev"))
      .orderBy(col("d1").asc_nulls_last, col("d2").asc_nulls_last,
        col("lev").asc_nulls_last)
  }

  /** Registered fixture query blocks on lang — the scale-safe default a
    * production corpus would use; cross-lang char-level near-dups are
    * out of scope for it by design (they remain reachable via
    * `blockCols = Nil`). Candidate generation is the segment-signature
    * path: the r7 sf1 scaling run showed count-based bucketing going
    * quadratic on statistically-clone crowds, while segments stay
    * linear (both paths are lossless — FuzzyJoinSpec proves them equal
    * to each other and to brute force). */
  private def q62(s: SparkSession, dir: String): DataFrame =
    levenshteinPairsSegment(Tables.t(s, dir, "documents"), blockCols = Seq("lang"))

  /** Independent oracle: brute-force all pairs — no blocking replay. */
  private val q62Sql =
    """SELECT a.doc_id AS d1, b.doc_id AS d2,
      |  levenshtein(a.text, b.text)::BIGINT AS lev
      |FROM documents a JOIN documents b ON a.doc_id < b.doc_id
      |WHERE a.lang = b.lang
      |  AND abs(length(a.text) - length(b.text)) <= 10
      |  AND levenshtein(a.text, b.text) <= 10
      |ORDER BY d1 ASC NULLS LAST, d2 ASC NULLS LAST, lev ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q62_fuzzy_join", q62, Some(q62Sql)))
}
