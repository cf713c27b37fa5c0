package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8: two data-selection passes for training-corpus assembly.
  *
  * q138 — n-gram novelty: score each document by the fraction of its
  * trigram shingles whose FIRST corpus occurrence (min doc_id in
  * ingestion order) is this document — the "how much new text does
  * this doc contribute" signal that complements near-dup dedup (a doc
  * can be 0.3-similar to everything yet add nothing new). One
  * shingle-keyed min aggregate + one doc-keyed ratio — the shingle
  * explode is the same frame q27's dedup already builds.
  *
  * q139 — greedy budget selection: rank documents by a
  * quality-per-token ratio and take the prefix that fits a token
  * budget — the knapsack-greedy data-mix step. The budget cut keeps a
  * row iff the PREVIOUS cumulative total still fits, so the output is
  * the maximal greedy prefix. Ranking ties break on doc_id.
  *
  * The global running sum is two-phase (the q56 block discipline,
  * r13: it was the one fact-sized unpartitioned window the r12 gwin
  * audit flagged): docs are binned into 256 ratio-range blocks (floor
  * binning is monotone, so block order extends the ratio order), the
  * within-block prefix sum is block-partitioned, and the only
  * unpartitioned window (plan contract: gwin=1) is the block-offset
  * cumsum over the ≤257-row block-total frame. Budget pruning falls
  * out for free: a block whose offset already exceeds the budget
  * cannot contribute, so every later block is dropped BEFORE the
  * per-row window — the expensive stage runs only over the candidate
  * prefix blocks, not the corpus. The DuckDB oracle keeps the plain
  * single-window form; cumulative sums are exact integers, so the
  * two shapes agree bit-for-bit. */
object Novelty {

  private val Budget = 10000L // tokens

  /** Q138: per-document trigram novelty, top 50 by novelty. */
  private def q138(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      // guard: sequence(0, size-3) DESCENDS for docs under 3 tokens
      // (yielding null shingles) where the oracle's comprehension
      // yields none — drop them on both sides identically
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 3), i -> " +
          "concat(w[i], ' ', w[i+1], ' ', w[i+2]))")).as("sh"))
      .distinct()
    val first = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .cast("long").as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 9).as("novelty"))
      .orderBy(col("novelty").desc_nulls_last, col("doc_id").asc_nulls_last)
      .limit(50)
  }

  private val q138Sql =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
      |      FOR i IN range(1, len(s) - 1)]) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)),
      |first AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh)
      |SELECT doc_id, COUNT(*) AS n_shingles,
      |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  ROUND(CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*), 9) AS novelty
      |FROM sh JOIN first USING (sh)
      |GROUP BY doc_id
      |ORDER BY novelty DESC NULLS LAST, doc_id ASC NULLS LAST
      |LIMIT 50""".stripMargin

  /** Q139: greedy quality-per-token selection under a 10k-token
    * budget (tokens ≈ whitespace tokens; quality ≈ mean token length
    * as a deterministic stand-in for a learned score). */
  private def q139(s: SparkSession, dir: String): DataFrame = {
    val bins = 256
    val docs = Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"),
        (col("n_chars").cast("double") /
          size(split(col("text"), " "))).as("quality"))
      .withColumn("ratio", col("quality") / col("tokens"))
    val rng = docs.agg(min(col("ratio")).as("mn"), max(col("ratio")).as("mx"))
    // descending blocks: blk 0 holds the best ratios; equal ratios
    // share a block (value binning), so block order + within-block
    // (ratio desc, doc_id asc) IS the global greedy order
    val blocked = docs.join(broadcast(rng), lit(true))
      .withColumn("blk",
        when(col("ratio").isNull, lit(bins))
          .when(col("mx") > col("mn"),
            least(floor((col("mx") - col("ratio")) /
              ((col("mx") - col("mn")) / bins)), lit(bins - 1)))
          .otherwise(lit(0)).cast("int"))
    val wOff = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the only unpartitioned window: ≤ bins+1 block-total rows; blocks
    // already past the budget are pruned before the per-row stage
    val boff = blocked.groupBy(col("blk")).agg(sum(col("tokens")).as("bn"))
      .withColumn("boff", sum(col("bn")).over(wOff) - col("bn"))
      .where(col("boff") <= Budget)
      .select(col("blk"), col("boff"))
    val wIn = Window.partitionBy(col("blk"))
      .orderBy(col("ratio").desc_nulls_last, col("doc_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, -1)
    blocked.join(broadcast(boff), Seq("blk"))
      .withColumn("cum_before",
        col("boff") + coalesce(sum(col("tokens")).over(wIn), lit(0L)))
      .where(col("cum_before") + col("tokens") <= Budget)
      .select(col("doc_id"), col("tokens"), round(col("quality"), 9).as("quality"),
        (col("cum_before") + col("tokens")).cast("long").as("cum_tokens"))
      .orderBy(col("cum_tokens").asc_nulls_last)
  }

  private val q139Sql =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |    CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS quality
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, tokens, quality,
       |    COALESCE(SUM(tokens) OVER (
       |      ORDER BY quality / tokens DESC NULLS LAST, doc_id ASC NULLS LAST
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM d)
       |SELECT doc_id, tokens, ROUND(quality, 9) AS quality,
       |  CAST(cum_before + tokens AS BIGINT) AS cum_tokens
       |FROM ranked
       |WHERE cum_before + tokens <= $Budget
       |ORDER BY cum_tokens ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q138_novelty", q138, Some(q138Sql)),
    QueryDef("q139_budget_select", q139, Some(q139Sql)))
}
