package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how target-like it is
  * under two hashed-n-gram bag-of-words models,
  *   log w(x) = Σ_{f ∈ feats(x)} [ ln p_target(h(f)) − ln p_raw(h(f)) ]
  * with unigram+bigram features hashed into `Buckets` buckets (the
  * paper's hashed generative model) and add-one smoothing on both
  * distributions. High-weight documents are the ones importance
  * resampling keeps to match the target distribution (the paper seeds
  * target = Wikipedia/books; here target = the corpus's English slice).
  *
  * Scale shape (100 TB): the model is a BUCKETS-sized table no matter
  * the corpus size — both distributions are one map-side-combined
  * aggregation over the exploded feature stream, and scoring broadcasts
  * the bucket table back over a second stream: two corpus scans, one
  * broadcast, zero corpus-keyed shuffles beyond the per-doc combine.
  * Selection on top of the scores is a TakeOrdered top-k (q20's shape),
  * deliberately not fused here so the score table can feed multiple
  * resampling rates.
  *
  * Oracle parity: bucket counts are exact integers; the log-ratio is
  * ln(double/double) − ln(double/double) (each a single rounded IEEE op
  * in both engines), truncated to DECIMAL(20,12) per feature before the
  * order-independent sum (q72 discipline), and both outputs round to 6
  * digits.
  *
  * Reference scope note: no data-selection surface in the reference
  * engine — part of the training-data-pipeline extension.
  */
object Dsir {

  private val Buckets = 1024

  private def bucketOf(c: Column): Column =
    conv(substring(md5(c), 1, 6), 16, 10).cast("long") % Buckets

  /** PUBLIC API — per-document DSIR importance weights over
    * (doc_id, text) given a target predicate:
    * (doc_id, is_target, n_feats, log_w, weight = log_w / n_feats).
    *
    * Plan shape — two feature-explode scans, deliberately: the bucket
    * distributions and the scoring both consume the exploded stream, but
    * each consumer partial-aggregates map-side down to a tiny exchange
    * (≤ Buckets rows per partition for the counts; one row per doc for
    * the scores), so re-deriving the stream costs only codegen'd
    * split+md5 CPU. The measured alternative — folding a per-(doc,
    * bucket) histogram once and reusing its exchange — was 25% SLOWER at
    * sf0.1 (3.44 s vs 2.74 s) because the histogram exchange carries
    * corpus-proportional rows where this shape shuffles almost nothing;
    * at 100 TB that trade only worsens (shuffle IO vs rescan CPU). */
  def dsirWeights(docs: DataFrame, targetPred: Column,
      textCol: String = "text"): DataFrame = {
    def feats = docs
      .withColumn("s", split(col(textCol), " "))
      .withColumn("bgs",
        when(size(col("s")) < 2, array().cast("array<string>"))
          .otherwise(expr(
            "transform(sequence(1, size(s) - 1)," +
              " i -> concat(element_at(s, i), ' ', element_at(s, i + 1)))")))
      .select(col("doc_id"), targetPred.as("is_target"),
        explode(concat(col("s"), col("bgs"))).as("feat"))
      .withColumn("b", bucketOf(col("feat")))
    val counts = feats.groupBy(col("b")).agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val logRatio = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("nt") + Buckets).cast("double"))
          - log((col("cr") + 1).cast("double") / (col("nr") + Buckets).cast("double")))
          .cast("decimal(20,12)").as("lw"))
    feats.join(broadcast(logRatio), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(first(col("is_target")).as("is_target"),
        count(lit(1)).as("n_feats"),
        round(sum(col("lw")).cast("double"), 6).as("log_w"),
        round(sum(col("lw")).cast("double") / count(lit(1)), 6).as("weight"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  // fanOut(doc_id) tried r17 and REVERTED: wall-neutral (2.23→2.15 s,
  // noise) while summed task time rose 2.1→30.8 s — the serial explode
  // was never the wall here (the ~10 planning-floor jobs are), and 32
  // concurrent explode tasks contend on memory bandwidth for pure
  // waste. The measured q88 negative from r16 (per-(doc,bucket)
  // histogram fold, 25% slower) also stands — see dsirWeights.
  private def q88(s: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.t(s, dir, "documents"), col("lang") === "en")

  private val q88Sql =
    s"""WITH d AS (SELECT doc_id, lang = 'en' AS is_target,
       |    string_split(text, ' ') AS s FROM documents),
       |db AS (SELECT doc_id, is_target, s,
       |  CASE WHEN len(s) < 2 THEN [] ELSE
       |    [s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))] END AS bgs FROM d),
       |feats AS (
       |  SELECT doc_id, is_target,
       |    ('0x' || substr(md5(unnest(list_concat(s, bgs))), 1, 6))::BIGINT % $Buckets AS b
       |  FROM db),
       |counts AS (
       |  SELECT b, SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
       |    COUNT(*) AS cr FROM feats GROUP BY b),
       |totals AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM counts),
       |lr AS (
       |  SELECT b,
       |    CAST(ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + $Buckets AS DOUBLE))
       |      - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + $Buckets AS DOUBLE))
       |      AS DECIMAL(20,12)) AS lw
       |  FROM counts CROSS JOIN totals)
       |SELECT doc_id, ANY_VALUE(is_target) AS is_target, COUNT(*) AS n_feats,
       |  ROUND(CAST(SUM(lw) AS DOUBLE), 6) AS log_w,
       |  ROUND(CAST(SUM(lw) AS DOUBLE) / COUNT(*), 6) AS weight
       |FROM feats JOIN lr USING (b)
       |GROUP BY doc_id ORDER BY doc_id ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q88_dsir", q88, Some(q88Sql)))
}
