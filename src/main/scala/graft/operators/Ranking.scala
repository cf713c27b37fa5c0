package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword search over the corpus: Okapi BM25 scoring (Robertson &
  * Zaragoza 2009, with the Lucene +1 idf smoothing so scores stay
  * positive) — the retrieval primitive a training-data pipeline uses
  * for targeted corpus slicing ("all docs about X") next to the
  * embedding ANN path (q29).
  *
  * Plan shape at scale: one explode of the corpus feeds three
  * aggregates — per-doc length, per-(doc, term) tf (pre-filtered to
  * the query terms, so this frame is |terms|-bounded per doc), and the
  * per-term df derived from tf (|terms| rows). Corpus stats and df are
  * single-row/tiny frames broadcast into the scoring join; the only
  * corpus-sized shuffles are the two doc-keyed aggregates. Nothing is
  * keyed by term alone except the |terms|-row df frame, so a hot term
  * cannot skew a partition.
  *
  * Float discipline: every factor (idf, length norm) is a
  * deterministic scalar expression mirrored token-for-token in the
  * oracle SQL; the only order-dependent float op is the final sum of
  * ≤ |terms| per-term components, neutralized by 6-dp rounding (the
  * same tolerance-free trick as the 9-dp cosine rounding in Dedup).
  */
object Ranking {

  /** PUBLIC API — BM25 top-k doc search for a bag of query terms over
    * (doc_id, text). Returns (doc_id, score) for the k best docs,
    * score rounded to 6 dp, ties broken by doc_id. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val tf = tok.where(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))

    val idf: Column =
      log(((col("n_docs") - col("df")).cast("double") + 0.5)
        / (col("df").cast("double") + 0.5) + 1)
    val avgdl: Column = col("tot").cast("double") / col("n_docs")
    val comp: Column =
      (idf * (col("tf") * lit(k1 + 1))) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))

    tf.join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), comp.as("comp"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("comp")), 6).as("score"))
      .orderBy(col("score").desc_nulls_last, col("doc_id").asc_nulls_last)
      .limit(k)
  }

  private val queryTerms = Seq("data", "query", "join")

  private def q57(s: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.t(s, dir, "documents"), queryTerms)

  private val q57Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM tok GROUP BY doc_id),
      |stats AS (SELECT COUNT(*)::BIGINT AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
      |tf AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS tf FROM tok
      |  WHERE tok IN ('data', 'query', 'join') GROUP BY doc_id, tok),
      |df AS (SELECT tok, COUNT(*)::BIGINT AS df FROM tf GROUP BY tok),
      |sc AS (SELECT tf.doc_id,
      |  ln((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1)
      |    * (tf * (1.2 + 1))
      |    / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(tot AS DOUBLE) / n_docs))) AS comp
      |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats)
      |SELECT doc_id, ROUND(SUM(comp), 6) AS score FROM sc GROUP BY doc_id
      |ORDER BY score DESC NULLS LAST, doc_id ASC NULLS LAST LIMIT 20""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q57_bm25", q57, Some(q57Sql)))
}
