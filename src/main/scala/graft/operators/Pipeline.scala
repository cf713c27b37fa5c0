package graft.operators

import graft.{Canon, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite corpus-cleaning pipeline — the flagship training-data shape:
  * quality scoring → quality filter → content-hash exact dedup →
  * language ID → per-language corpus statistics, one declarative DAG.
  *
  * This is what the individual G7 operators exist FOR; chained, Catalyst
  * sees the whole pipeline and (a) evaluates the quality filter in the
  * scan stage before anything shuffles, (b) dedups on a 128-bit content
  * hash so the exchange carries ~50 B/doc instead of the document text,
  * (c) finishes with one partial+final aggregation on the (tiny)
  * language key space. At 100 TB the only wide exchange is the dedup
  * hash partition — exactly one full-data shuffle for the whole pipeline.
  *
  * Heuristics are shared with TextAnalysis (same expressions, same
  * stopword profiles) and every step is IEEE/Integer-deterministic, so
  * the DuckDB oracle replays the entire pipeline bit-identically.
  */
object Pipeline {

  private val langCase =
    """case
      |  when en_hits >= de_hits and en_hits >= fr_hits and en_hits >= es_hits and en_hits > 0 then 'en'
      |  when de_hits >= fr_hits and de_hits >= es_hits and de_hits > 0 then 'de'
      |  when fr_hits >= es_hits and fr_hits > 0 then 'fr'
      |  when es_hits > 0 then 'es'
      |  else 'und' end""".stripMargin

  /** PUBLIC API — the full corpus-cleaning pipeline over any
    * (doc_id, lang, text) DataFrame. */
  def corpusClean(docs: DataFrame, qualityThreshold: Double = 0.35): DataFrame = {
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id").asc_nulls_last)
    docs
      .withColumn("s", split(col("text"), " "))
      .withColumn("n_tokens", size(col("s")))
      .withColumn("ttr",
        expr("cast(size(array_distinct(s)) as double) / size(s)"))
      .withColumn("stop_ratio",
        expr("cast(size(filter(s, x -> x in ('the', 'a', 'of', 'and'))) as double) / size(s)"))
      .withColumn("quality",
        expr("0.3 * ttr + 0.3 * stop_ratio + 0.4 * least(1.0, cast(n_tokens as double) / 100.0)"))
      .withColumn("en_hits", expr("size(filter(s, x -> x in ('the', 'a', 'of', 'and')))"))
      .withColumn("de_hits", expr("size(filter(s, x -> x in ('der', 'die', 'das', 'und')))"))
      .withColumn("fr_hits", expr("size(filter(s, x -> x in ('le', 'la', 'les', 'et')))"))
      .withColumn("es_hits", expr("size(filter(s, x -> x in ('el', 'los', 'las', 'y')))"))
      .where(col("quality") > qualityThreshold)
      // project BEFORE the dedup shuffle: the window exchange carries the
      // content hash + a handful of numeric columns, never `text`/`s`
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"),
        col("n_tokens"), col("quality"), col("en_hits"), col("de_hits"),
        col("fr_hits"), col("es_hits"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .withColumn("pred_lang", expr(langCase))
      // (labeled × predicted) confusion cells — a per-language corpus
      // ledger AND a lang-id quality report in one output
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        Canon.davg(col("quality"), 9, 4).as("avg_quality"))
      .orderBy(col("lang").asc_nulls_last, col("pred_lang").asc_nulls_last)
  }

  private def q35(s: SparkSession, dir: String): DataFrame =
    corpusClean(Tables.t(s, dir, "documents"))

  private val q35Sql =
    s"""WITH d AS (SELECT doc_id, lang, text, string_split(text, ' ') AS s FROM documents),
       |st AS (SELECT doc_id, lang, text,
       |  len(s) AS n_tokens,
       |  CAST(len(list_distinct(s)) AS DOUBLE) / len(s) AS ttr,
       |  CAST(len(list_filter(s, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(s) AS stop_ratio,
       |  len(list_filter(s, x -> x IN ('the', 'a', 'of', 'and'))) AS en_hits,
       |  len(list_filter(s, x -> x IN ('der', 'die', 'das', 'und'))) AS de_hits,
       |  len(list_filter(s, x -> x IN ('le', 'la', 'les', 'et'))) AS fr_hits,
       |  len(list_filter(s, x -> x IN ('el', 'los', 'las', 'y'))) AS es_hits
       |FROM d),
       |q AS (SELECT *,
       |  0.3 * ttr + 0.3 * stop_ratio + 0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) AS quality
       |FROM st),
       |f AS (SELECT * FROM q WHERE quality > 0.35),
       |dd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn FROM f),
       |k AS (SELECT * FROM dd WHERE rn = 1),
       |p AS (SELECT *, CASE
       |  WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
       |  WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de'
       |  WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
       |  WHEN es_hits > 0 THEN 'es'
       |  ELSE 'und' END AS pred_lang FROM k)
       |SELECT lang, pred_lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  ${Canon.sqlDavg("quality", 9, 4)} AS avg_quality
       |FROM p GROUP BY lang, pred_lang
       |ORDER BY lang ASC NULLS LAST, pred_lang ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q35_corpus_pipeline", q35, Some(q35Sql)))
}
