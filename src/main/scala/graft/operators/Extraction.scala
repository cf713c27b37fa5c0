package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8: span-extraction reporting — count identifier-like spans
  * (emails, URLs, long digit runs) per source BEFORE redaction: the
  * measurement side of q70's PII pass (you gate a corpus on leak
  * density, then redact what remains). Patterns are RE2-safe literal
  * classes (no backrefs/lookarounds), so Java regex and DuckDB's RE2
  * match identically.
  *
  * Plan: one scan; `regexp_count`-style folds via size(regexp_extract_all)
  * — map-side combined per source. Output is |sources| rows. */
object Extraction {

  // Mixed-case classes spelled out (not (?i)): Bob@Mail.com and
  // HTTP://… count too, and the literal ranges keep Java-regex/RE2
  // parity trivially (a flag prefix has subtly different scoping rules
  // across engines; a character class cannot).
  private val EmailRe = "[a-zA-Z0-9]+@[a-zA-Z0-9]+\\.[a-zA-Z]+"
  private val UrlRe = "[hH][tT][tT][pP][sS]?://[a-zA-Z0-9./-]+"
  private val DigitRe = "[0-9]{6,}"

  /** PUBLIC API — per-group span-extraction report over (group, text)
    * rows. The fixture corpus contains no identifier-like spans (its
    * report is honestly all-zero — the CLEAN verdict a gate wants), so
    * ExtractionSpec proves the extractors on planted spans. */
  def spanReport(docs: DataFrame, groupCol: String = "source"): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))))
          .cast("long").as("n_emails"),
        sum(size(regexp_extract_all(col("text"), lit(UrlRe), lit(0))))
          .cast("long").as("n_urls"),
        sum(size(regexp_extract_all(col("text"), lit(DigitRe), lit(0))))
          .cast("long").as("n_digit_runs"))
      .orderBy(col(groupCol).asc_nulls_last)

  /** Q145: per-source span-extraction report. */
  private def q145(s: SparkSession, dir: String): DataFrame =
    spanReport(Tables.t(s, dir, "documents"))

  private val q145Sql =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(len(regexp_extract_all(text, '$EmailRe'))) AS BIGINT) AS n_emails,
       |  CAST(SUM(len(regexp_extract_all(text, '$UrlRe'))) AS BIGINT) AS n_urls,
       |  CAST(SUM(len(regexp_extract_all(text, '$DigitRe'))) AS BIGINT) AS n_digit_runs
       |FROM documents
       |GROUP BY source
       |ORDER BY source ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q145_span_report", q145, Some(q145Sql)))
}
