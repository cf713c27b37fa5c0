package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-label embedding centroids — the training step of the IVF index
  * (q29_ann_ivf quantizes against centroids; this operator is the
  * transparent, oracle-checked version of how such centroids are
  * computed at corpus scale).
  *
  * Plan shape: posexplode fans each vector into (label, dim, value)
  * rows — 64× the input, but map-side combined immediately by the
  * (label, dim) hash aggregate, so the shuffle carries only
  * |labels| × dims partial sums regardless of corpus size.
  *
  * Float discipline: float→double promotion is exact; the per-cell sum
  * accumulates in DECIMAL(28,6) — a correctly-rounded decimal cast of
  * a binary double can never sit exactly on a rounding boundary, so
  * Spark (HALF_UP) and DuckDB agree bit-for-bit, and decimal addition
  * is order-independent where double addition is not (the same
  * discipline as [[graft.Canon.dsum]]). The final divide-by-count back
  * in double is a single deterministic operation per cell.
  */
object Embeddings {

  /** PUBLIC API — per-(label, dimension) centroid over
    * (label, embedding: array&lt;float&gt;). Returns
    * (label, dim, centroid, n_vecs) with dim 0-based. */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(
        (sum(col("v").cast("double").cast(DecimalType(28, 6))).cast("double")
          / count(lit(1))).as("centroid"),
        count(lit(1)).as("n_vecs"))
      .orderBy(col("label").asc_nulls_last, col("dim").asc_nulls_last)

  private def q61(s: SparkSession, dir: String): DataFrame =
    labelCentroids(Tables.t(s, dir, "embeddings"))

  private val q61Sql =
    """WITH e AS (SELECT label, unnest(embedding) AS v,
      |  unnest(generate_series(0, len(embedding) - 1)) AS dim FROM embeddings)
      |SELECT label, dim::INT AS dim,
      |  CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS centroid,
      |  COUNT(*)::BIGINT AS n_vecs
      |FROM e GROUP BY label, dim
      |ORDER BY label ASC NULLS LAST, dim ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q61_label_centroids", q61, Some(q61Sql)))
}
