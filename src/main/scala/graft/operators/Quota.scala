package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source document quota by ranked quality — the per-domain cap of
  * the web-corpus curation recipes (RefinedWeb/C4 keep at most N pages
  * per domain so no host dominates the mix; here `source` plays the
  * domain role and the q85 hashed linear scorer supplies the ranking):
  * keep the top-k highest-scoring documents per source, deterministic
  * ties by doc_id. Complements the SAMPLING mixers — q53 gates by fixed
  * per-stratum rates, q84 by corpus-derived temperature rates — with
  * selection by RANK, the shape used when a quality signal exists.
  *
  * Scale shape: scoring is q85's map-only codegen fold (no explode, no
  * join); the rank filter is Spark's WindowGroupLimit pushdown
  * (SPARK-37099, asserted in WindowLimitSpec) — each map task keeps at
  * most k rows per source BEFORE the exchange, so the shuffle carries
  * O(sources × k × tasks) rows, never the corpus. A hot domain with
  * millions of pages contributes k rows per task upstream and exactly k
  * rows downstream.
  */
object Quota {

  private val K = 10

  /** PUBLIC API — top-`k` docs per source by hashed quality score:
    * (doc_id, source, score, rank). */
  def perSourceQuota(docs: DataFrame, k: Int = K): DataFrame = {
    val scored = Quality.hashedQualityScore(docs, carry = Seq("source"))
      .withColumn("score", col("raw_score").cast("double") / col("n_feats"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc_nulls_last, col("doc_id").asc_nulls_last)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("source"), col("score"), col("rank"))
      .orderBy(col("source").asc_nulls_last, col("rank").asc_nulls_last)
  }

  private def q91(s: SparkSession, dir: String): DataFrame =
    perSourceQuota(Tables.t(s, dir, "documents"))

  private val q91Sql =
    s"""WITH ${Quality.scoreSqlCtes("source")},
       |r AS (
       |  SELECT doc_id, source,
       |    CAST(raw_score AS DOUBLE) / n_feats AS score,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY CAST(raw_score AS DOUBLE) / n_feats DESC NULLS LAST,
       |               doc_id ASC NULLS LAST) AS rank
       |  FROM m)
       |SELECT doc_id, source, score, rank FROM r WHERE rank <= $K
       |ORDER BY source ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q91_source_quota", q91, Some(q91Sql)))
}
