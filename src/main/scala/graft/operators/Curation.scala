package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators (round 5): the cleaning passes a training-
  * data pipeline runs between quality filtering (q58) and dedup (q26-28)
  * — PII redaction, repetition collapse, unigram-LM scoring, BPE pair
  * mining. The reference's byte-opaque shuffle carries any of these as
  * row transforms (celeborn: HashBasedShuffleWriter.java:251-276 never
  * interprets payloads); Spark-side they are map-only codegen or
  * vocabulary-bounded aggregations — shapes that survive 100 TB.
  *
  * Fixture note: `documents.text` is synthetic space-separated tokens
  * with no digits or punctuation, so the PII fixture query injects
  * deterministic PII derived from fixture columns (source, doc_id) —
  * identically derivable in the DuckDB oracle — while the public APIs
  * operate on any text column.
  */
object Curation {

  // portable between Java regex (Spark) and RE2 (DuckDB): no lookaround,
  // no \b, greedy classes only
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  val Ipv4Pattern = "\\d+\\.\\d+\\.\\d+\\.\\d+"
  val PhonePattern = "\\+\\d+-\\d+-\\d+"

  /** PUBLIC API — redact emails / IPv4s / phone numbers in `textCol`,
    * appending match counts and the redacted text. Map-only: four
    * codegen'd regex expressions per row, no shuffle, no UDF. Redaction
    * order (email → ip → phone) is fixed so the passes compose
    * deterministically. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailPattern)).cast("long"))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Pattern)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhonePattern)).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "<EMAIL>"),
            Ipv4Pattern, "<IP>"),
          PhonePattern, "<PHONE>"))
  }

  /** PUBLIC API — collapse runs of consecutive identical tokens
    * ("a a the" → "a the"), the cheap repetition-removal pass before
    * expensive near-dup detection. One higher-order filter per row,
    * map-only, stays in whole-stage codegen. */
  def collapseRepeats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("s", split(col(textCol), " "))
      // lambda index i is 0-based and s[i-1] is 0-based indexing, so
      // s[i-1] is the previous token; i = 0 always keeps the first
      .withColumn("collapsed", expr("filter(s, (x, i) -> i = 0 OR x != s[i-1])"))

  /** PUBLIC API — per-document mean negative log-likelihood under the
    * corpus's own unigram model: the perplexity-style fluency score
    * pipelines use to drop gibberish (CCNet-style filtering, Wenzek et
    * al. 2020, via a unigram stand-in). Scale shape: the corpus
    * shuffles once, keyed by doc_id; the 1-row total broadcasts
    * unconditionally, but the vocabulary frame is NOT hinted (r16) —
    * "vocab-sized" is unbounded on a replicated-vocab corpus (q87's
    * hinted twin materialized 39.8 GiB at sf100), so AQE broadcasts
    * it from measured size only while it genuinely fits. Per-token NLL terms accumulate in
    * DECIMAL(20,12) so the sum is order-independent (bit-exact vs the
    * oracle), divided and rounded at the end. */
  def unigramNll(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("n"))
    val nll = vocab.crossJoin(broadcast(total))
      .select(col("tok"),
        (-log(col("c").cast("double") / col("n").cast("double")))
          .cast("decimal(20,12)").as("nll"))
    tok.join(nll, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6).as("avg_nll"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** PUBLIC API — adjacent-token pair counts, the inner statistic of a
    * BPE/WordPiece vocabulary-training round (Sennrich et al. 2016: each
    * merge picks the most frequent pair). One explode + one hash
    * aggregation; Top-K lands in TakeOrderedAndProject, so the driver
    * sees k rows, never the pair distribution. */
  def bpePairCounts(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    docs.withColumn("s", split(col(textCol), " "))
      .where(size(col("s")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(s) - 1)," +
          " i -> concat(element_at(s, i), ' ', element_at(s, i + 1)))")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc_nulls_last, col("pair").asc_nulls_last)
      .limit(k)

  /** Deterministic PII injection for the fixture query — same expression
    * the oracle derives in SQL. */
  private def withPii(docs: DataFrame): DataFrame =
    docs.withColumn("pii_text", concat(
      col("text"), lit(" contact "), col("source"), lit("@example.com from 192.168."),
      (col("doc_id") % 256).cast("string"), lit("."),
      (col("doc_id") * 7 % 256).cast("string"), lit(" call +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0")))

  private def q70(s: SparkSession, dir: String): DataFrame =
    redactPii(withPii(Tables.t(s, dir, "documents")), "pii_text")
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy(col("doc_id").asc_nulls_last)

  private val q70Sql =
    s"""WITH p AS (SELECT doc_id,
      |  text || ' contact ' || source || '@example.com from 192.168.' ||
      |  CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
      |  ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      |FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '$EmailPattern')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '$Ipv4Pattern')) AS BIGINT) AS n_ips,
      |  CAST(len(regexp_extract_all(t, '$PhonePattern')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(regexp_replace(regexp_replace(t,
      |    '$EmailPattern', '<EMAIL>', 'g'), '$Ipv4Pattern', '<IP>', 'g'),
      |    '$PhonePattern', '<PHONE>', 'g')) AS redacted_md5
      |FROM p ORDER BY doc_id ASC NULLS LAST""".stripMargin

  private def q71(s: SparkSession, dir: String): DataFrame =
    collapseRepeats(Tables.t(s, dir, "documents"), "text")
      .select(col("doc_id"),
        size(col("s")).cast("long").as("n_before"),
        size(col("collapsed")).cast("long").as("n_after"),
        md5(array_join(col("collapsed"), " ")).as("collapsed_md5"))
      .orderBy(col("doc_id").asc_nulls_last)

  private val q71Sql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
      |c AS (SELECT doc_id, s,
      |  list_filter(s, (x, i) -> i = 1 OR x != s[i - 1]) AS collapsed FROM d)
      |SELECT doc_id, len(s)::BIGINT AS n_before, len(collapsed)::BIGINT AS n_after,
      |  md5(array_to_string(collapsed, ' ')) AS collapsed_md5
      |FROM c ORDER BY doc_id ASC NULLS LAST""".stripMargin

  private def q72(s: SparkSession, dir: String): DataFrame =
    unigramNll(Tables.t(s, dir, "documents"))

  private val q72Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |vocab AS (SELECT tok, COUNT(*)::BIGINT AS c FROM tok GROUP BY tok),
      |total AS (SELECT SUM(c)::BIGINT AS n FROM vocab),
      |nll AS (SELECT tok,
      |  CAST(-ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(20,12)) AS nll
      |FROM vocab, total)
      |SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
      |  round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
      |FROM tok JOIN nll USING (tok)
      |GROUP BY doc_id ORDER BY doc_id ASC NULLS LAST""".stripMargin

  private def q73(s: SparkSession, dir: String): DataFrame =
    bpePairCounts(Tables.t(s, dir, "documents"), 50)

  private val q73Sql =
    """WITH d AS (SELECT string_split(text, ' ') AS s FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |pairs AS (SELECT unnest([s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))]) AS pair FROM d)
      |SELECT pair, COUNT(*)::BIGINT AS c FROM pairs GROUP BY pair
      |ORDER BY c DESC NULLS LAST, pair ASC NULLS LAST LIMIT 50""".stripMargin

  // ---- q83: BPE-style subword encode with the mined merge table ---------

  /** PUBLIC API — BPE-style subword ENCODE: mine the top-k adjacent
    * CHARACTER pairs (weighted by word frequency — the char-level twin
    * of [[bpePairCounts]]), then apply them as a rank-ordered merge
    * table to every distinct word and return the top-k resulting
    * subword tokens by corpus frequency.
    *
    * Merge semantics (deterministic, both-engine-replayable): each
    * merge is applied ONCE in rank order, leftmost-first and
    * non-overlapping — the single-pass approximation of Sennrich
    * iterate-lowest-rank (they differ only when a later merge recreates
    * an earlier merge's pattern). The token state is a
    * double-separator string (`US tok US US tok US`): each replace
    * consumes one separator from each boundary, so adjacent merge sites
    * stay independently matchable — plain left-to-right `replace`
    * is then EXACTLY leftmost non-overlapping pair merging, identical
    * in Spark, DuckDB, and java.lang.String.
    *
    * Scale: everything downstream of the word-frequency aggregate runs
    * on DISTINCT WORDS (vocabulary-sized, Zipf-bounded), not corpus
    * tokens — encode once per word, weight by count. The merge table is
    * one broadcast single-row array (the q72 vocabulary pattern); no
    * driver collect, no UDF: the fold is the `aggregate` HOF over 50
    * `replace` calls. */
  def bpeEncode(docs: DataFrame, k: Int = 50): DataFrame = {
    val wf = docs.where(length(col("text")) > 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val pc = wf
      .select(col("wc"), explode(expr(
        """CASE WHEN length(w) < 2 THEN array() ELSE
          |  transform(sequence(1, length(w) - 1),
          |    i -> concat(substring(w, i, 1), ' ', substring(w, i + 1, 1))) END""".stripMargin))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("c"))
      .orderBy(col("c").desc_nulls_last, col("pair").asc_nulls_last)
      .limit(k)
    // rank-ordered merge list as ONE array row (sort_array on (-count,
    // pair) structs — collect_list alone has no order guarantee)
    val merges = pc
      .agg(sort_array(collect_list(struct((-col("c")).as("negc"),
        col("pair").as("pair")))).as("sm"))
      .select(expr("transform(sm, x -> x.pair)").as("ms"))
    val enc = wf.crossJoin(broadcast(merges))
      .withColumn("state", expr(
        """aggregate(ms,
          |  concat(char(31), array_join(transform(sequence(1, length(w)),
          |    i -> substring(w, i, 1)), concat(char(31), char(31))), char(31)),
          |  (acc, m) -> replace(acc,
          |    concat(char(31), element_at(split(m, ' '), 1), char(31),
          |      char(31), element_at(split(m, ' '), 2), char(31)),
          |    concat(char(31), element_at(split(m, ' '), 1),
          |      element_at(split(m, ' '), 2), char(31))))""".stripMargin))
    enc
      .select(col("wc"),
        explode(split(expr("trim(BOTH char(31) FROM state)"), "\u001f\u001f")).as("tok"))
      .groupBy(col("tok")).agg(sum(col("wc")).as("c"))
      .orderBy(col("c").desc_nulls_last, col("tok").asc_nulls_last)
      .limit(k)
  }

  private def q83(s: SparkSession, dir: String): DataFrame =
    bpeEncode(Tables.t(s, dir, "documents"))

  private val q83Sql =
    """WITH words AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents WHERE length(text) > 0),
      |wf AS (SELECT w, COUNT(*) AS wc FROM words WHERE length(w) >= 1 GROUP BY w),
      |cpairs AS (
      |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, length(w))]) AS pair, wc
      |  FROM wf),
      |pc AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS c FROM cpairs GROUP BY pair),
      |merges AS (
      |  SELECT list(pair ORDER BY c DESC, pair ASC) AS ms
      |  FROM (SELECT pair, c FROM pc ORDER BY c DESC NULLS LAST, pair ASC NULLS LAST LIMIT 50)),
      |enc AS (
      |  SELECT wf.w, wf.wc,
      |    list_reduce(
      |      [chr(31) || array_to_string([w[i] for i in range(1, length(w) + 1)], chr(31) || chr(31)) || chr(31)] || ms,
      |      (acc, m) -> replace(acc,
      |        chr(31) || split_part(m, ' ', 1) || chr(31) || chr(31) || split_part(m, ' ', 2) || chr(31),
      |        chr(31) || split_part(m, ' ', 1) || split_part(m, ' ', 2) || chr(31))) AS state
      |  FROM wf, merges),
      |toks AS (
      |  SELECT unnest(string_split(trim(state, chr(31)), chr(31) || chr(31))) AS tok, wc
      |  FROM enc)
      |SELECT tok, CAST(SUM(wc) AS BIGINT) AS c
      |FROM toks GROUP BY tok
      |ORDER BY c DESC NULLS LAST, tok ASC NULLS LAST LIMIT 50""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q70_pii_redact", q70, Some(q70Sql)),
    QueryDef("q71_repetition_collapse", q71, Some(q71Sql)),
    QueryDef("q72_unigram_nll", q72, Some(q72Sql)),
    QueryDef("q73_bpe_pairs", q73, Some(q73Sql)),
    QueryDef("q83_bpe_encode", q83, Some(q83Sql)))
}
