package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G7 text-analysis operators over the `documents` table: token
  * counting, per-document quality statistics, heuristic language ID and
  * rolling-hash fingerprinting.
  *
  * All ratios are int/int IEEE divisions and all hashes are md5-derived
  * modular folds, so every query here is replayable by the DuckDB
  * oracle with bit-identical results (no rounding anywhere).
  *
  * Scale notes: everything is explode → hash-aggregate → (optional)
  * ranking window — map-side combined, no driver collection. Top-k per
  * group is a window over the already-aggregated (lang, token) counts,
  * whose cardinality is bounded by vocabulary, not corpus size.
  */
object TextAnalysis {

  /** Q29 token counts: top-20 tokens per language by frequency
    * (explode = the Generator/UDTF surface of SURVEY §2B Q29/Q30). */
  def tokenCounts(docs: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc_nulls_last, col("tok").asc_nulls_last)
    docs
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .orderBy(col("lang").asc_nulls_last, col("rn").asc_nulls_last)
  }

  private def qTokenCounts(s: SparkSession, dir: String): DataFrame =
    tokenCounts(Tables.t(s, dir, "documents"))

  private val tokenCountsSql =
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tc AS (SELECT lang, tok, COUNT(*) AS n FROM tok GROUP BY lang, tok),
      |ranked AS (SELECT lang, tok, n, ROW_NUMBER() OVER (PARTITION BY lang
      |  ORDER BY n DESC NULLS LAST, tok ASC NULLS LAST) AS rn FROM tc)
      |SELECT lang, tok, n, rn FROM ranked WHERE rn <= 20
      |ORDER BY lang ASC NULLS LAST, rn ASC NULLS LAST""".stripMargin

  /** Per-document quality statistics: token counts, type-token ratio,
    * average token length, stopword ratio, and a blended quality score.
    * All raw IEEE doubles — no rounding, oracle-identical. */
  def textStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("s", split(col("text"), " "))
      .select(
        col("doc_id"),
        col("n_chars"),
        size(col("s")).as("n_tokens"),
        size(array_distinct(col("s"))).as("n_uniq"),
        expr("cast(aggregate(transform(s, x -> length(x)), 0, (a, b) -> a + b) as double)" +
          " / size(s)").as("avg_tok_len"),
        expr("cast(size(array_distinct(s)) as double) / size(s)").as("ttr"),
        expr("cast(size(filter(s, x -> x in ('the', 'a', 'of', 'and'))) as double)" +
          " / size(s)").as("stop_ratio"))
      .withColumn("quality",
        expr("0.3 * ttr + 0.3 * stop_ratio + 0.4 * least(1.0, cast(n_tokens as double) / 100.0)"))
      .orderBy(col("doc_id").asc_nulls_last)

  private def qTextStats(s: SparkSession, dir: String): DataFrame =
    textStats(Tables.t(s, dir, "documents"))

  private val textStatsSql =
    """WITH d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS s FROM documents),
      |st AS (SELECT doc_id, n_chars,
      |  len(s) AS n_tokens,
      |  len(list_distinct(s)) AS n_uniq,
      |  CAST(list_sum(list_transform(s, x -> len(x))) AS DOUBLE) / len(s) AS avg_tok_len,
      |  CAST(len(list_distinct(s)) AS DOUBLE) / len(s) AS ttr,
      |  CAST(len(list_filter(s, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(s) AS stop_ratio
      |FROM d)
      |SELECT doc_id, n_chars, n_tokens, n_uniq, avg_tok_len, ttr, stop_ratio,
      |  0.3 * ttr + 0.3 * stop_ratio + 0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) AS quality
      |FROM st ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** Heuristic language ID: stopword-profile hit counts with a
    * deterministic argmax (ties resolved in profile order). */
  def langId(docs: DataFrame): DataFrame =
    docs
      .withColumn("s", split(col("text"), " "))
      .select(
        col("doc_id"),
        col("lang").as("labeled_lang"),
        expr("size(filter(s, x -> x in ('the', 'a', 'of', 'and')))").as("en_hits"),
        expr("size(filter(s, x -> x in ('der', 'die', 'das', 'und')))").as("de_hits"),
        expr("size(filter(s, x -> x in ('le', 'la', 'les', 'et')))").as("fr_hits"),
        expr("size(filter(s, x -> x in ('el', 'los', 'las', 'y')))").as("es_hits"))
      .withColumn("pred_lang",
        expr("""case
          |  when en_hits >= de_hits and en_hits >= fr_hits and en_hits >= es_hits and en_hits > 0 then 'en'
          |  when de_hits >= fr_hits and de_hits >= es_hits and de_hits > 0 then 'de'
          |  when fr_hits >= es_hits and fr_hits > 0 then 'fr'
          |  when es_hits > 0 then 'es'
          |  else 'und' end""".stripMargin))
      .orderBy(col("doc_id").asc_nulls_last)

  private def qLangId(s: SparkSession, dir: String): DataFrame =
    langId(Tables.t(s, dir, "documents"))

  private val langIdSql =
    """WITH d AS (SELECT doc_id, lang AS labeled_lang, string_split(text, ' ') AS s FROM documents),
      |h AS (SELECT doc_id, labeled_lang,
      |  len(list_filter(s, x -> x IN ('the', 'a', 'of', 'and'))) AS en_hits,
      |  len(list_filter(s, x -> x IN ('der', 'die', 'das', 'und'))) AS de_hits,
      |  len(list_filter(s, x -> x IN ('le', 'la', 'les', 'et'))) AS fr_hits,
      |  len(list_filter(s, x -> x IN ('el', 'los', 'las', 'y'))) AS es_hits
      |FROM d)
      |SELECT doc_id, labeled_lang, en_hits, de_hits, fr_hits, es_hits,
      |  CASE
      |    WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
      |    WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de'
      |    WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
      |    WHEN es_hits > 0 THEN 'es'
      |    ELSE 'und' END AS pred_lang
      |FROM h ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** Rolling-hash document fingerprint: left fold of
    * acc*131 + md5_32(token) (mod 1e9+7) over the token stream, plus a
    * same-fingerprint count (exact-dup detector robust to storage
    * differences). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs
      .select(col("doc_id"),
        expr("aggregate(split(text, ' '), 0L, (acc, t) -> " +
          "(acc * 131 + cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)) % 1000000007)")
          .as("fp"))
      .withColumn("n_same", count(lit(1)).over(w))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    fingerprint(Tables.t(s, dir, "documents"))

  private val fingerprintSql =
    """WITH f AS (SELECT doc_id,
      |  list_reduce(list_prepend(0::BIGINT,
      |    list_transform(string_split(text, ' '), t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
      |    (acc, h) -> (acc * 131 + h) % 1000000007) AS fp
      |FROM documents)
      |SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS n_same
      |FROM f ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** BPE-style pre-tokenizer counting: tokens are maximal runs of
    * letters, digits, or single punctuation marks (the GPT-2 pre-tokenizer
    * shape, simplified to a regex both engines execute identically), with
    * per-language totals + distinct-token vocab size. */
  def tokenRegex(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .as("tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("vocab"))
      .orderBy(col("lang").asc_nulls_last)

  private def qTokenRegex(s: SparkSession, dir: String): DataFrame =
    tokenRegex(Tables.t(s, dir, "documents"))

  private val tokenRegexSql =
    """WITH tok AS (SELECT lang,
      |  unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS tok
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS vocab
      |FROM tok GROUP BY lang ORDER BY lang ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q29_token_counts", qTokenCounts, Some(tokenCountsSql)),
    QueryDef("q29_token_regex", qTokenRegex, Some(tokenRegexSql)),
    QueryDef("q31_text_stats", qTextStats, Some(textStatsSql)),
    QueryDef("q32_lang_id", qLangId, Some(langIdSql)),
    QueryDef("q33_fingerprint", qFingerprint, Some(fingerprintSql)))
}
