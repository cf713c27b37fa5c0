package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the TPC-H-ish star schema + events/documents/
  * embeddings (schemas in FIXTURES.md). One parquet file per table; at
  * cluster scale these would be directories of many files — the reader
  * code is identical either way, and Catalyst handles split planning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Fixture quirk: `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which
    * Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL) unless this session
    * conf is set. It must be set at session CONSTRUCTION (Bench, Verify,
    * and test builders all do) — schema inference consults only the
    * session conf, so a per-read option cannot express it, and mutating
    * the conf inside a table loader would leak global state. */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Read `ts` as raw nanos and truncate to microseconds — the same
    * truncation DuckDB applies, keeping oracle parity. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get(NanosConf, "false") == "true",
      s"reading `events` requires $NanosConf=true at session construction")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Register all tables of a scale-factor dir as temp views. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
