package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interpolated bigram language-model perplexity scoring — the KenLM
  * shape of the CCNet / LLaMA corpus filters (Wenzek et al. 2020
  * "CCNet": keep/bucket documents by LM perplexity; production runs a
  * 5-gram KenLM, this is the same statistic at bigram order). Extends
  * q72's unigram NLL with a conditional term: per token,
  *   p(w | u) = λ · c(u,w) / c(u·) + (1 − λ) · c(w) / N
  * (c(u·) = occurrences of u as a bigram PREFIX, so the conditional
  * sums to 1 per context; the unigram interpolation floors unseen
  * continuations — standard Jelinek-Mercer smoothing), and the document
  * score is mean −ln p over its tokens (first token scored by the
  * unigram term alone).
  *
  * Scale shape (100 TB): the statistic tables split by size class. The
  * unigram vocabulary and the prefix-count table are vocabulary-bounded
  * → BROADCAST; the bigram count table grows with the corpus (pair
  * vocabulary) → it stays a SHUFFLE join keyed by (prev, cur), the plan
  * any KenLM-at-scale scoring job has. All aggregations are map-side
  * combined counts; nothing collects to the driver.
  *
  * Oracle parity: counts are exact integers; probabilities are the same
  * IEEE double expression tree in both engines (λ = 0.5 is exactly
  * representable, each division/multiply/add is a single rounded op,
  * same left-to-right shape); per-token −ln p goes through the q72
  * DECIMAL(20,12) truncation before the order-independent sum, and the
  * final mean is rounded to 6 digits.
  *
  * Reference scope note: no LM surface in the reference engine — part of
  * the training-data-pipeline extension.
  */
object NgramLm {

  private val Lambda = 0.5

  /** PUBLIC API — per-document interpolated bigram NLL over
    * (doc_id, text): (doc_id, n_tokens, avg_nll). */
  def bigramNll(docs: DataFrame, lambda: Double = Lambda,
      textCol: String = "text"): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val uni = tok.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    val total = uni.agg(sum(col("cu")).as("n"))
    val bg = docs.withColumn("s", split(col(textCol), " "))
      .where(size(col("s")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(s) - 1)," +
          " i -> struct(element_at(s, i) AS prev, element_at(s, i + 1) AS cur))")).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.cur").as("cur"))
    val bgCounts = bg.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cb"))
    // r17 (guide §2.1): the prefix marginal is the row-sum of the pair
    // counts (c(u·) = Σ_w c(u,w)), so it derives from bgCounts instead
    // of re-aggregating the full bigram stream — one corpus pass fewer.
    val prefix = bgCounts.groupBy(col("prev")).agg(sum(col("cb")).as("cp"))
    // r17 (guide §2.3 — shuffle/score the light form): −ln p depends
    // only on the PAIR, so it is computed once per distinct (prev, cur)
    // on the pair-vocabulary-sized count table and attached to the
    // stream by ONE join — the r16 shape dragged every occurrence
    // through three statistic joins plus the crossJoin. Identical
    // expression tree per token (same IEEE ops, same DECIMAL(20,12)
    // truncation point), so the per-doc decimal sums are bit-equal.
    // Join sizing: the pair table grows with the corpus, never hinted —
    // r16 removed the bare broadcast() hints after a "vocabulary-sized"
    // hinted build materialized 39.8 GiB at sf100 (over Spark's hard
    // 8 GiB cap). AQE broadcasts the pair-nll table from MEASURED sizes
    // whenever it genuinely fits; past that the stream join falls back
    // to shuffle — and now shuffles ONE small decimal per pair instead
    // of three statistic columns. `total` stays hinted: 1 row.
    val pairNll = bgCounts
      .join(prefix, Seq("prev"))
      .join(uni.withColumnRenamed("tok", "cur"), Seq("cur"))
      .crossJoin(broadcast(total))
      .select(col("prev"), col("cur"),
        (-log(lit(lambda) * (col("cb").cast("double") / col("cp").cast("double"))
          + lit(1 - lambda) * (col("cu").cast("double") / col("n").cast("double"))))
          .cast("decimal(20,12)").as("nll"))
    val cond = bg.join(pairNll, Seq("prev", "cur"))
      .select(col("doc_id"), col("nll"))
    // first token of every document: unigram-only
    val first = docs
      .select(col("doc_id"), element_at(split(col(textCol), " "), 1).as("tok"))
      .join(uni, Seq("tok")) // vocab-sized: AQE decides (see above)
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (-log(col("cu").cast("double") / col("n").cast("double")))
          .cast("decimal(20,12)").as("nll"))
    cond.union(first).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6).as("avg_nll"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  private def q87(s: SparkSession, dir: String): DataFrame =
    bigramNll(Tables.t(s, dir, "documents"))

  private val q87Sql =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |uni AS (SELECT tok, COUNT(*) AS cu FROM tok GROUP BY tok),
       |total AS (SELECT SUM(cu) AS n FROM uni),
       |bg AS (
       |  SELECT doc_id, unnest([{'prev': s[i], 'cur': s[i + 1]}
       |    FOR i IN range(1, len(s))], recursive := true)
       |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
       |  WHERE len(s) >= 2),
       |bgc AS (SELECT prev, cur, COUNT(*) AS cb FROM bg GROUP BY prev, cur),
       |pfx AS (SELECT prev, COUNT(*) AS cp FROM bg GROUP BY prev),
       |cond AS (
       |  SELECT bg.doc_id,
       |    CAST(-ln(${Lambda} * (CAST(cb AS DOUBLE) / CAST(cp AS DOUBLE))
       |      + ${1 - Lambda} * (CAST(cu AS DOUBLE) / CAST(n AS DOUBLE)))
       |      AS DECIMAL(20,12)) AS nll
       |  FROM bg JOIN bgc ON bg.prev = bgc.prev AND bg.cur = bgc.cur
       |    JOIN pfx ON bg.prev = pfx.prev
       |    JOIN uni ON bg.cur = uni.tok
       |    CROSS JOIN total),
       |frst AS (
       |  SELECT doc_id,
       |    CAST(-ln(CAST(cu AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(20,12)) AS nll
       |  FROM (SELECT doc_id, string_split(text, ' ')[1] AS tok FROM documents)
       |  JOIN uni USING (tok) CROSS JOIN total),
       |allt AS (SELECT * FROM cond UNION ALL SELECT * FROM frst)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |  ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
       |FROM allt GROUP BY doc_id
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q87_bigram_lm", q87, Some(q87Sql)))
}
