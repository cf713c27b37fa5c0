package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate the tokenized corpus
  * in doc_id order and chunk it into fixed-capacity context windows
  * (the standard concat-and-chunk batching scheme), reporting how each
  * window is filled. Exact integer semantics end to end — token offsets
  * are running sums, window spans are integer division — so the DuckDB
  * oracle replays nothing: it computes the same windows from a plain
  * global `SUM() OVER (ORDER BY doc_id)`.
  *
  * The global prefix sum is the scale hazard: a single `ORDER BY`
  * window is one task holding the whole corpus. Here it is two-phase,
  * the same shape as the reference's chunk-offset index (one small
  * index row per 8 MiB chunk instead of one global scan,
  * docs/developers/storage.md "ReducePartition"): per-block running
  * sums partitioned by `doc_id div blockSize` (parallel, bounded by
  * the block), plus a cumulative offset over the per-block totals — a
  * frame of corpus/blockSize rows in one small window task. Size
  * `blockSize` so BOTH stay bounded: at 10^10 docs, blockSize = 10^6
  * gives 10^6-doc blocks and a 10^4-row offset frame. The fixture
  * default (4096) keeps the per-block window under a task's memory at
  * any corpus size the tests reach.
  *
  * Plan contract: gwin=1 — the ONE unpartitioned window is the block-
  * offset cumsum over the corpus/blockSize-row per-block-total frame,
  * bounded by construction; the per-doc windows are block-partitioned.
  */
object Packing {

  /** PUBLIC API — pack documents (doc_id, text) into `capacity`-token
    * context windows in doc_id order. Returns one row per window:
    * (window_id, n_docs, n_tokens, min_doc, max_doc); every interior
    * window carries exactly `capacity` tokens (docs split across
    * window boundaries contribute their overlap to each side).
    * `blockSize` bounds the per-task prefix-sum run (ids are assumed
    * dense enough that a block holds ≲ blockSize docs). */
  def packWindows(docs: DataFrame, capacity: Long = 256L,
      blockSize: Long = 4096L): DataFrame = {
    val d = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("blk", expr(s"doc_id div $blockSize"))
    val wBlk = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = d.withColumn("cum_in_blk", sum(col("n")).over(wBlk))
    // Per-block totals: tiny frame (corpus/blockSize rows); its global
    // running sum is the only single-task window and is bounded by the
    // block count, not the corpus.
    val blkTotals = d.groupBy(col("blk")).agg(sum(col("n")).as("blk_n"))
    val wOff = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = blkTotals
      .withColumn("blk_off", sum(col("blk_n")).over(wOff) - col("blk_n"))
      .select(col("blk"), col("blk_off"))
    val spans = within.join(broadcast(offsets), "blk")
      .withColumn("start", col("blk_off") + col("cum_in_blk") - col("n"))
      .withColumn("fin", col("start") + col("n") - 1)
    spans
      .select(col("doc_id"), col("start"), col("fin"),
        explode(expr(s"sequence(start div $capacity, fin div $capacity)"))
          .as("window_id"))
      .groupBy(col("window_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(least(col("fin"), (col("window_id") + 1) * capacity - 1)
          - greatest(col("start"), col("window_id") * capacity) + 1)
          .as("n_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("window_id").asc_nulls_last)
  }

  private def q56(s: SparkSession, dir: String): DataFrame =
    packWindows(Tables.t(s, dir, "documents"))

  /** Independent oracle: one global running sum — correct at oracle
    * scale, deliberately NOT the two-phase plan the engine runs. */
  private val q56Sql =
    """WITH d AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n FROM documents),
      |o AS (SELECT doc_id, n,
      |  CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n AS BIGINT) AS start FROM d),
      |s AS (SELECT doc_id, n, start, start + n - 1 AS fin FROM o),
      |w AS (SELECT doc_id, start, fin,
      |  unnest(generate_series(start // 256, fin // 256)) AS window_id FROM s)
      |SELECT window_id,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(LEAST(fin, (window_id + 1) * 256 - 1)
      |    - GREATEST(start, window_id * 256) + 1) AS BIGINT) AS n_tokens,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM w GROUP BY window_id
      |ORDER BY window_id ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q56_seq_packing", q56, Some(q56Sql)))
}
