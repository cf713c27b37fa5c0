package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temperature-weighted source resampling — the exponential-smoothing
  * mix (Conneau et al. 2020 "Unsupervised Cross-lingual Representation
  * Learning at Scale" §3.1; Lample & Conneau 2019 §3.1) used to rebalance
  * a multi-source corpus before training: sampling probability
  * p_s ∝ (n_s / N)^α with α < 1 UPSAMPLES rare sources and downsamples
  * dominant ones. Complements q53's `stratifiedMix`, whose per-stratum
  * rates are fixed inputs — here the rates are DERIVED from the corpus's
  * own source histogram, so the operator is a two-pass plan:
  *
  *   pass 1  per-source counts — one corpus aggregation, map-side
  *           combined, so the exchange carries O(sources × tasks) rows;
  *   rates   α-smoothing over the counts frame (|sources| rows — driver
  *           never sees it, but every join of it broadcasts);
  *   pass 2  re-scan, broadcast-join the rate table, keep each doc iff
  *           md5(doc_id) mod 1e6 < threshold_s, aggregate per source.
  *
  * Two corpus scans is the canonical shape for derived-rate sampling at
  * 100 TB (the histogram must exist before any row can be kept); both
  * scans prune to the columns they need, and no corpus-sized shuffle
  * exists anywhere — both aggregations are keyed by `source` AFTER
  * map-side partial aggregation.
  *
  * Determinism/oracle parity: the sampling key is md5(doc_id) (q53's
  * stable-hash pattern — the mix is re-derivable across engines and
  * runs); α is fixed at 0.5 so the smoothing is `sqrt`, correctly
  * rounded IEEE-754 in both Spark and DuckDB; the normalizer Z
  * accumulates in DECIMAL(20,12) (q72's pattern) so the per-source sum
  * is order-independent; thresholds collapse to integers via floor
  * before any row is gated, so the kept set is bit-exactly replayable.
  */
object Mixing {

  /** PUBLIC API — α=0.5 temperature mix of `docs` by `srcCol`, targeting
    * a global budget of (corpus size div budgetDiv) kept docs. Returns
    * one row per source: original count, integer sampling threshold
    * (out of 1e6), kept count and kept token sum. */
  def temperatureMix(docs: DataFrame, srcCol: String = "source",
      budgetDiv: Int = 2): DataFrame = {
    val bySrc = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("n_s"))
    val tot = bySrc.agg(sum(col("n_s")).as("n"))
    val w = bySrc.crossJoin(broadcast(tot))
      .withColumn("w_dec",
        sqrt(col("n_s").cast("double") / col("n").cast("double"))
          .cast("decimal(20,12)"))
    val z = w.agg(sum(col("w_dec")).as("z"))
    // rate_s = min(1, budget * p_s / n_s); integerized to a 1e6 threshold
    val rates = w.crossJoin(broadcast(z))
      .withColumn("threshold",
        floor(least(lit(1.0),
          expr(s"cast(n div $budgetDiv as double)") *
            (col("w_dec").cast("double") / col("z").cast("double")) /
            col("n_s").cast("double")) * lit(1000000.0)).cast("bigint"))
      .select(col(srcCol), col("n_s"), col("threshold"))

    val hmod: Column = expr(
      "cast(conv(substr(md5(cast(doc_id as string)), 1, 6), 16, 10) as bigint) % 1000000")
    val keptAgg = docs
      .join(broadcast(rates.select(col(srcCol), col("threshold"))), Seq(srcCol))
      .where(hmod < col("threshold"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("k"),
        sum(size(split(col("text"), " ")).cast("long")).as("kt"))

    rates.join(keptAgg, Seq(srcCol), "left")
      .select(col(srcCol), col("n_s").as("n_orig"), col("threshold"),
        coalesce(col("k"), lit(0L)).as("n_kept"),
        coalesce(col("kt"), lit(0L)).as("kept_toks"))
      .orderBy(col(srcCol).asc_nulls_last)
  }

  private def q84(s: SparkSession, dir: String): DataFrame =
    temperatureMix(Tables.t(s, dir, "documents"))

  private val q84Sql =
    """WITH src AS (SELECT source, COUNT(*)::BIGINT AS n_s FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM src),
      |w AS (SELECT source, n_s, n,
      |  CAST(sqrt(CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(20,12)) AS w_dec
      |  FROM src, tot),
      |z AS (SELECT SUM(w_dec) AS z FROM w),
      |r AS (SELECT source, n_s,
      |  CAST(floor(LEAST(CAST(1.0 AS DOUBLE),
      |    CAST(n // 2 AS DOUBLE) * (CAST(w_dec AS DOUBLE) / CAST(z AS DOUBLE))
      |      / CAST(n_s AS DOUBLE)) * 1000000.0) AS BIGINT) AS threshold
      |  FROM w, z),
      |ka AS (SELECT d.source, COUNT(*)::BIGINT AS k,
      |    CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS kt
      |  FROM documents d JOIN r ON d.source = r.source
      |  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 6))::BIGINT % 1000000 < r.threshold
      |  GROUP BY d.source)
      |SELECT r.source, n_s AS n_orig, threshold,
      |  CAST(COALESCE(k, 0) AS BIGINT) AS n_kept,
      |  CAST(COALESCE(kt, 0) AS BIGINT) AS kept_toks
      |FROM r LEFT JOIN ka ON r.source = ka.source
      |ORDER BY r.source ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q84_temperature_mix", q84, Some(q84Sql)))
}
