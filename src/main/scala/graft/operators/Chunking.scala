package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-document sliding-window chunking: split each document into
  * fixed-size token chunks with overlap (the RAG/pretraining chunking
  * scheme that q56's global concat-and-chunk deliberately is not —
  * chunks never cross document boundaries here, and consecutive chunks
  * share `chunkSize - stride` tokens of context).
  *
  * Pure per-row array work: tokenize once, generate chunk starts with
  * `sequence(0, n-1, stride)`, slice and re-join. No shuffle at all
  * until the output sort — at 100 TB this is a map-only pass whose
  * output is written partition-parallel (the sort exists only for the
  * oracle's deterministic row order and would be dropped in production).
  */
object Chunking {

  /** PUBLIC API — chunk (doc_id, text) into `chunkSize`-token windows
    * every `stride` tokens. Returns one row per chunk:
    * (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text). */
  def chunkDocs(docs: DataFrame, chunkSize: Int = 32,
      stride: Int = 24): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      "need 0 < stride <= chunkSize so chunks tile without gaps")
    docs
      .withColumn("s", split(col("text"), " "))
      .withColumn("start_tok",
        explode(expr(s"sequence(0, size(s) - 1, $stride)")))
      .select(
        col("doc_id"),
        expr(s"start_tok div $stride").cast("long").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(chunkSize), size(col("s")) - col("start_tok"))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("s"), col("start_tok") + 1, lit(chunkSize)))
          .as("chunk_text"))
      .orderBy(col("doc_id").asc_nulls_last, col("chunk_id").asc_nulls_last)
  }

  private def q59(s: SparkSession, dir: String): DataFrame =
    chunkDocs(Tables.t(s, dir, "documents"))

  private val q59Sql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
      |c AS (SELECT doc_id, s,
      |  unnest(generate_series(0, len(s) - 1, 24)) AS start_tok FROM d)
      |SELECT doc_id,
      |  (start_tok // 24)::BIGINT AS chunk_id,
      |  start_tok::BIGINT AS start_tok,
      |  LEAST(32, len(s) - start_tok)::BIGINT AS n_chunk_tokens,
      |  array_to_string(list_slice(s, start_tok + 1, start_tok + 32), ' ') AS chunk_text
      |FROM c
      |ORDER BY doc_id ASC NULLS LAST, chunk_id ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q59_doc_chunks", q59, Some(q59Sql)))
}
