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

  /** PUBLIC API — per-group distinctive keywords by TF-IDF: for each
    * value of `groupCol`, the `k` tokens with the highest
    * tf × ln(nGroups / df) where df counts groups containing the token.
    * Corpus-level profiling (what distinguishes each language/source
    * slice) next to q57's query-level BM25.
    *
    * Plan shape: ONE corpus scan — explode → (group, token) hash agg
    * (map-side combined) — materialized via localCheckpoint at its
    * vocabulary × groups size (corpus-size-independent). Without the
    * checkpoint Catalyst column-prunes the df branch into its own
    * corpus scan (plan-audited); with it, df, the group count, and the
    * ranking all read the small frame. WindowGroupLimit prunes to k
    * before the final sort. Scores are 9-dp rounded BEFORE ranking so
    * both engines rank identical values. */
  def tfidfKeywords(docs: DataFrame, groupCol: String = "lang",
      k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("score").desc_nulls_last, col("tok").asc_nulls_last)
    val tf = docs
      .select(col(groupCol), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ng = tf.agg(countDistinct(col(groupCol)).as("n_groups"))
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(ng))
      .withColumn("score",
        round(col("tf") * log(col("n_groups").cast("double") / col("df")), 9))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(groupCol), col("rn"), col("tok"), col("tf"), col("df"), col("score"))
      .orderBy(col(groupCol).asc_nulls_last, col("rn").asc_nulls_last)
  }

  private def q67(s: SparkSession, dir: String): DataFrame =
    tfidfKeywords(Tables.t(s, dir, "documents"))

  private val q67Sql =
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT lang, tok, COUNT(*)::BIGINT AS tf FROM tok GROUP BY lang, tok),
      |df AS (SELECT tok, COUNT(*)::BIGINT AS df FROM tf GROUP BY tok),
      |ng AS (SELECT COUNT(DISTINCT lang)::BIGINT AS n_groups FROM tf),
      |sc AS (SELECT lang, tok, tf, df,
      |  ROUND(tf * ln(CAST(n_groups AS DOUBLE) / df), 9) AS score
      |  FROM tf JOIN df USING (tok) CROSS JOIN ng),
      |r AS (SELECT lang, tok, tf, df, score, ROW_NUMBER() OVER (PARTITION BY lang
      |  ORDER BY score DESC NULLS LAST, tok ASC NULLS LAST) AS rn FROM sc)
      |SELECT lang, rn, tok, tf, df, score FROM r WHERE rn <= 5
      |ORDER BY lang ASC NULLS LAST, rn ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q57_bm25", q57, Some(q57Sql)),
    QueryDef("q67_tfidf_keywords", q67, Some(q67Sql)))
}
