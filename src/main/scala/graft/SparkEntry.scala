package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2B. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(d => d.name -> d.run).toMap

  /** DuckDB-runnable ANSI SQL oracle per query (same parquet tables).
    * Queries without an entry get a weaker rows-only check and are
    * covered by ScalaTest fixtures instead. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
