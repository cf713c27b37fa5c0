package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8: feature-scaling statistics — the standardization ("fit")
  * pass an embedding pipeline runs before whitening, ANN indexing, or
  * model ingestion (complements q101's sample-based PCA: these moments
  * are EXACT and corpus-wide). Per dimension: mean and (sample)
  * standard deviation.
  *
  * Scale shape: ONE posexplode scan → map-side-combined aggregate keyed
  * by dimension — the shuffle carries (dims × partitions) partial rows
  * regardless of corpus size, and the output is dims rows. The apply
  * pass (x−μ)/σ is a map-only broadcast of the 64-row frame (same
  * pattern as q101_pca_project, not re-demonstrated).
  *
  * Oracle parity: sums accumulate in DECIMAL (order-independent;
  * x and x·x are per-row double products both engines compute
  * identically from the same floats), and μ/σ are derived from the
  * exact sums by the SAME double expression tree on both sides, then
  * 9-dp rounded. */
object Features {

  /** Q121: per-dimension mean and stddev of the embedding corpus,
    * dimensions 1-based to match the oracle's list ordinals.
    *
    * Moment sums run on the paired-longs exact path
    * ([[graft.Canon.psumAggs]]): x and x² carry the same DECIMAL
    * (·,12)/(·,14) roundings the decimal-sum path applied (via
    * [[graft.Canon.pterm]]'s scale-12/14 casts), so the recombined
    * sums are bit-identical and the DuckDB oracle is unchanged.
    * Bounds: |x| < 1 (unit-scale embedding components; < 10 with
    * margin), so u₁ = x·10^12 < 10^13 and u₂ = x²·10^14 < 10^16 —
    * both ≪ 2^63, with per-dimension Σhi < (10^16/2^30)·rows ≈
    * 10^7·rows, safe past 10^11 vectors. */
  private def q121(s: SparkSession, dir: String): DataFrame = {
    val n = count(lit(1)).cast("double")
    Tables.t(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select((col("pos") + 1).cast("long").as("dim"),
        col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(n.as("n"),
        (graft.Canon.psumAggs(graft.Canon.pterm(col("x"), 12), "s1") ++
          graft.Canon.psumAggs(
            graft.Canon.pterm(col("x") * col("x"), 14), "s2")): _*)
      .select(col("dim"), col("n"),
        graft.Canon.psumDouble("s1", 12).as("s1"),
        graft.Canon.psumDouble("s2", 14).as("s2"))
      .select(col("dim"),
        round(col("s1") / col("n"), 9).as("mu"),
        round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n") - lit(1.0))), 9).as("sigma"))
      .orderBy(col("dim").asc_nulls_last)
  }

  private val q121Sql =
    """WITH e AS (
      |  SELECT i.i AS dim, CAST(embedding[i.i] AS DOUBLE) AS x
      |  FROM embeddings, range(1, 65) i(i))
      |SELECT dim,
      |  ROUND(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 9) AS mu,
      |  ROUND(sqrt((CAST(SUM(CAST(x * x AS DECIMAL(28,14))) AS DOUBLE)
      |    - CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
      |      * CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE))
      |    / (CAST(COUNT(*) AS DOUBLE) - 1.0)), 9) AS sigma
      |FROM e GROUP BY dim
      |ORDER BY dim ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q121_standardize", q121, Some(q121Sql)))
}
