package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8: hybrid retrieval — the RAG-serving counterpart of the
  * corpus-side LLM operators. A retrieval stack at 100 TB runs a
  * LEXICAL leg (keyword match over an inverted index) and a VECTOR leg
  * (embedding similarity) and fuses the two rankings; reciprocal-rank
  * fusion (Cormack et al., SIGIR'09) is the standard scoreless fusion:
  * rrf(d) = Σ_legs 1 / (k + rank_leg(d)), k = 60.
  *
  * Scale shape (the reason each leg looks the way it does):
  *  - lexical: the query's DISTINCT tokens (bounded, broadcast) join the
  *    corpus posting lists token-first — an inverted-index probe, never
  *    a doc×doc text comparison; per-(query, doc) overlap is one
  *    map-side-combined count.
  *  - vector: exact cosine per query over the corpus (the fixture-scale
  *    baseline; at 100 TB the same fusion takes q29's IVF/LSH candidate
  *    stream — the legs are rank providers, fusion is agnostic).
  *  - fusion: two window ranks + ONE full-outer join on (query, doc);
  *    a doc absent from a leg simply contributes no term (COALESCE 0).
  *
  * Ranks are integers and every tie inside a leg breaks on id, so both
  * engines rank identically; the only doubles (cosine, rrf) follow the
  * q29 bit-exact fold + 9-dp-round discipline. documents.doc_id and
  * embeddings.vec_id share the 0..N id space (FIXTURES.md), pairing
  * each query's text with its embedding. */
object Hybrid {

  private val RrfK = 60
  private val TopK = 10
  private val NQueries = 5

  /** PUBLIC API: fuse any two (q_id, id, rank) rankings by RRF. */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int = RrfK,
      topK: Int = TopK): DataFrame = {
    val term = (r: Column) =>
      coalesce(lit(1.0) / (lit(k) + r), lit(0.0))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc_nulls_last, col("id").asc_nulls_last)
    lex.join(vec, Seq("q_id", "id"), "full_outer")
      .withColumn("rrf", round(term(col("r_lex")) + term(col("r_vec")), 9))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("id"), col("rrf"))
      .orderBy(col("q_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  /** Q118: RRF hybrid retrieval for the first 5 documents-as-queries:
    * distinct-token-overlap lexical ranking fused with exact-cosine
    * vector ranking, top-10 fused results per query. */
  private def q118(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(s, dir, "documents").select(col("doc_id"), col("text"))
    val qtok = docs.where(col("doc_id") < NQueries)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
    val dtok = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
    val wl = Window.partitionBy(col("q_id"))
      .orderBy(col("overlap").desc_nulls_last, col("id").asc_nulls_last)
    val lex = dtok.join(broadcast(qtok), "tok")
      .where(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id").as("id"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("r_lex", row_number().over(wl))
      .select(col("q_id"), col("id"), col("r_lex"))

    val e = Tables.t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val qv = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wv = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc_nulls_last, col("id").asc_nulls_last)
    val vec = e.join(broadcast(qv), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("id"),
        VectorOps.cosineFast(s, "q_emb", "embedding").as("cos"))
      .withColumn("r_vec", row_number().over(wv))
      .select(col("q_id"), col("id"), col("r_vec"))

    rrfFuse(lex, vec)
  }

  private val q118Sql =
    s"""WITH qtok AS (
       |  SELECT DISTINCT doc_id AS q_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents WHERE doc_id < $NQueries),
       |dtok AS (
       |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |lex AS (
       |  SELECT q_id, doc_id AS id, COUNT(*) AS overlap
       |  FROM qtok JOIN dtok USING (tok)
       |  WHERE doc_id <> q_id GROUP BY 1, 2),
       |lexr AS (
       |  SELECT q_id, id, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY overlap DESC NULLS LAST, id ASC NULLS LAST) AS r_lex
       |  FROM lex),
       |qv AS (SELECT vec_id AS q_id, embedding AS q_emb
       |  FROM embeddings WHERE vec_id < $NQueries),
       |vecs AS (
       |  SELECT qv.q_id, e.vec_id AS id,
       |    ${VectorSql.cosine("qv.q_emb", "e.embedding")} AS cos
       |  FROM embeddings e JOIN qv ON e.vec_id <> qv.q_id),
       |vecr AS (
       |  SELECT q_id, id, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC NULLS LAST, id ASC NULLS LAST) AS r_vec
       |  FROM vecs),
       |fused AS (
       |  SELECT COALESCE(l.q_id, v.q_id) AS q_id, COALESCE(l.id, v.id) AS id,
       |    ROUND(COALESCE(CAST(1 AS DOUBLE) / ($RrfK + r_lex), 0)
       |        + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + r_vec), 0), 9) AS rrf
       |  FROM lexr l FULL OUTER JOIN vecr v ON l.q_id = v.q_id AND l.id = v.id),
       |ranked AS (
       |  SELECT q_id, id, rrf, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY rrf DESC NULLS LAST, id ASC NULLS LAST) AS rank
       |  FROM fused)
       |SELECT q_id, rank, id, rrf FROM ranked WHERE rank <= $TopK
       |ORDER BY q_id ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q118_rrf_fusion", q118, Some(q118Sql)))
}
