package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Re-aggregatable distinct-count sketches (Apache DataSketches HLL,
  * Spark 4's `hll_sketch_agg`/`hll_union_agg`): per-source
  * distinct-token profiles whose SKETCHES — not just their numbers —
  * are the aggregation state, so profiles computed over disjoint slices
  * (per day, per shard, per source) merge into exact-union rollups
  * WITHOUT rescanning the data. This is the profiling discipline a
  * 100 TB pipeline needs: the corpus is scanned once per slice, the
  * kilobyte-sized sketches persist beside the data (q76's manifest
  * pattern), and every later rollup — global, per-language, per-month —
  * is a union over sketches. q11's `approx_count_distinct` gives one
  * non-reusable number; this gives mergeable state.
  *
  * Scale shape: one explode pass, sketch aggregation combines map-side
  * (each task folds its partition into a local sketch; the exchange
  * carries one ~2^lgK-byte sketch per source per partition, never
  * tokens). The union rollup aggregates 20 sketches.
  *
  * Sketch estimates are deterministic (hash-based, seed-free) but not
  * SQL-replayable, so q90_hll_profile is registered without an oracle —
  * its driver-checkable twin q90_distinct_exact computes the same
  * profile exactly (the q29_lsh/q29_lsh_cands split), and SketchSpec
  * bounds the sketch error against it and proves slice-merge equality.
  */
object Sketches {

  private val LgK = 12

  /** PUBLIC API — per-source distinct-token HLL estimates plus the
    * merged-global rollup row (source = `__ALL__`), computed by UNIONING
    * the per-source sketches, not rescanning. */
  def hllProfile(docs: DataFrame, lgK: Int = LgK): DataFrame = {
    val sketches = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("tok"), lgK).as("sk"))
    val per = sketches.select(col("source"),
      hll_sketch_estimate(col("sk")).as("est_distinct"))
    val global = sketches
      .agg(hll_union_agg(col("sk")).as("u"))
      .select(lit("__ALL__").as("source"),
        hll_sketch_estimate(col("u")).as("est_distinct"))
    per.unionByName(global).orderBy(col("source").asc_nulls_last)
  }

  /** PUBLIC API — the exact twin: per-source exact distinct-token counts
    * plus the global rollup (which SQL must recompute from the tokens —
    * exact distinct does not merge, which is the sketch's point). */
  def distinctExact(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val per = tok.groupBy(col("source"))
      .agg(countDistinct(col("tok")).as("n_distinct"))
    val global = tok.agg(countDistinct(col("tok")).as("n_distinct"))
      .select(lit("__ALL__").as("source"), col("n_distinct"))
    per.unionByName(global).orderBy(col("source").asc_nulls_last)
  }

  private def q90sketch(s: SparkSession, dir: String): DataFrame =
    hllProfile(Tables.t(s, dir, "documents"))

  private def q90exact(s: SparkSession, dir: String): DataFrame =
    distinctExact(Tables.t(s, dir, "documents"))

  private val q90exactSql =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |per AS (
      |  SELECT source, COUNT(DISTINCT tok) AS n_distinct FROM tok GROUP BY source),
      |tot AS (
      |  SELECT '__ALL__' AS source, COUNT(DISTINCT tok) AS n_distinct FROM tok)
      |SELECT * FROM per UNION ALL SELECT * FROM tot
      |ORDER BY source ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q90_hll_profile", q90sketch, None),
    QueryDef("q90_distinct_exact", q90exact, Some(q90exactSql)))
}
