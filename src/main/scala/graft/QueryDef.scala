package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator of the engine: a named DataFrame builder over a
  * scale-factor directory, with an optional ANSI-SQL oracle (run by the
  * driver in DuckDB over the same parquet tables). Queries with no
  * SQL-expressible oracle (approx sketches, streaming-only semantics)
  * leave `oracle` empty and are covered by ScalaTest fixtures instead.
  *
  * Determinism contract: every query's output is fully ordered by all
  * projected columns (explicit NULLS ordering on both sides), so the
  * driver's row-hash compare is stable.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {
  def all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Dedup.defs ++
      operators.IncrementalDedup.defs ++
      operators.Similarity.defs ++
      operators.Pq.defs ++
      operators.Spectral.defs ++
      operators.TextAnalysis.defs ++
      operators.Multimodal.defs ++
      operators.ImageDedup.defs ++
      operators.Pipeline.defs ++
      operators.TemporalJoins.defs ++
      operators.Upsert.defs ++
      operators.Bucketing.defs ++
      operators.Chunking.defs ++
      operators.Clusters.defs ++
      operators.Cohorts.defs ++
      operators.Compaction.defs ++
      operators.Curation.defs ++
      operators.Embeddings.defs ++
      operators.FuzzyJoin.defs ++
      operators.Graphs.defs ++
      operators.Funnel.defs ++
      operators.Decontam.defs ++
      operators.Mixing.defs ++
      operators.Evolution.defs ++
      operators.Export.defs ++
      operators.Packing.defs ++
      operators.Pruning.defs ++
      operators.Quality.defs ++
      operators.Quota.defs ++
      operators.Sharding.defs ++
      operators.TableDiff.defs ++
      operators.Ranking.defs ++
      operators.Sessionize.defs ++
      operators.SemDedup.defs ++
      operators.Sketches.defs ++
      operators.NgramLm.defs ++
      operators.Dsir.defs ++
      operators.Analytics.defs ++
      operators.TpchFull.defs ++
      operators.Hybrid.defs ++
      operators.Features.defs ++
      operators.Canonical.defs ++
      operators.RobustStats.defs ++
      operators.Sampling.defs ++
      operators.Skyline.defs ++
      operators.Incremental.defs ++
      operators.DataContract.defs ++
      operators.Resample.defs ++
      operators.Transitions.defs ++
      operators.LogReg.defs ++
      operators.KCore.defs ++
      operators.ItemSim.defs ++
      operators.Scd.defs ++
      operators.Experiment.defs ++
      operators.Novelty.defs ++
      operators.Diversity.defs ++
      operators.Twap.defs ++
      operators.Conversion.defs ++
      operators.Extraction.defs ++
      operators.Ols.defs ++
      operators.Assoc.defs ++
      operators.Baskets.defs ++
      operators.SlidingDistinct.defs ++
      operators.Mad.defs ++
      operators.Gini.defs ++
      operators.Drift.defs ++
      operators.Changepoint.defs ++
      operators.Survival.defs ++
      operators.Trend.defs ++
      operators.RollingTrend.defs ++
      operators.Seasonality.defs ++
      operators.Privacy.defs ++
      operators.Integrity.defs ++
      operators.Benford.defs ++
      streaming.StreamSlope.defs ++
      operators.LeadLag.defs ++
      operators.SeasonalAnomaly.defs ++
      operators.Richness.defs ++
      operators.ZOrder.defs ++
      streaming.EventWindows.defs ++
      streaming.StreamDedup.defs ++
      streaming.RateLimited.defs ++
      streaming.StreamJoin.defs ++
      streaming.StreamStaticJoin.defs ++
      streaming.StreamUpsert.defs ++
      streaming.ThresholdAlert.defs ++
      streaming.StreamDrift.defs ++
      streaming.StreamAssoc.defs ++
      operators.Udfs.defs
}
