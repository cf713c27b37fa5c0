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

  /** Fixture quirk (historical): some generator versions write `events.ts`
    * as INT64 TIMESTAMP(NANOS) parquet, which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless this session conf is set. It must be set
    * at session CONSTRUCTION (Bench, Verify, and test builders all do) —
    * schema inference consults only the session conf, so a per-read option
    * cannot express it. Newer fixtures write plain TIMESTAMP(MICROS); the
    * loader below handles either encoding by inspecting the read schema. */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Read `ts` as an instant TIMESTAMP at microsecond precision regardless
    * of the fixture's physical encoding: nanos-as-long files are truncated
    * to micros (the same truncation DuckDB applies, keeping oracle parity);
    * timezone-less micros files (pyarrow's default) arrive as TIMESTAMP_NTZ
    * and are cast to instant semantics under the session's UTC timezone —
    * bit-identical micros, but usable by `unix_micros` and as a streaming
    * event-time column, and the same instant DuckDB sees. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val fixed = raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
    fixed.select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Register all tables of a scale-factor dir as temp views. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** On-disk bytes of `$dir/$name.parquet` (file or directory of part
    * files) — the cheap scale signal the size-conditional broadcast
    * hints and Bench's threshold scaling key on. 0 when absent. */
  def bytesOf(spark: SparkSession, dir: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Post-read fan-out for unsplittable small inputs (optimization
    * guide §2.5 "one huge unsplittable file … repartition immediately
    * after the read"): the fixture tables are single-row-group parquet
    * files, so a scan stage is ONE task regardless of core count, and
    * everything Spark fuses into it — tokenize/explode/melt plus the
    * partial aggregation of every text operator — runs serial (r16
    * JobStats: q166's timed run was 14 s of task time across 15
    * single-task stages; q28's 60-sum simhash aggregation 3.7 s in one
    * task). Repartitioning right after the read unlocks the cores.
    *
    * Scale discipline: only fires while the table's on-disk footprint
    * is at most `capBytes` (default 256 MB — an exchange of ≤ 256 MB
    * compressed costs well under a second on every protocol tier) AND
    * the scan would plan fewer splits than the session's parallelism.
    * At sf10+ the fact tables cross the cap and the plan is untouched
    * — the sf100 board shapes keep their measured slopes. With `keys`,
    * partitioning is BY KEY, which downstream per-key aggregations
    * satisfy as a clustered distribution (subset rule), so the
    * repartition REPLACES the aggregation's own exchange instead of
    * adding one — and it moves the compact un-exploded rows where the
    * replaced exchange moved the exploded ones (§2.3: shuffle the
    * light form). Keyless fan-out is round-robin for skew-free spread
    * ahead of melt/explode stages whose aggregation keys don't exist
    * until after the explode. */
  def fanOut(spark: SparkSession, dir: String, name: String,
      keys: org.apache.spark.sql.Column*)(df: DataFrame): DataFrame = {
    // dev A/B toggles (r17 quiet re-pin protocol): =0 disables the
    // fan-out outright, _WIDTH pins the repartition width — so the
    // width-vs-contention A/B runs against one binary
    if (sys.env.get("SPARK_GRAFT_FANOUT").contains("0")) return df
    val bytes = bytesOf(spark, dir, name)
    val p = sys.env.get("SPARK_GRAFT_FANOUT_WIDTH").map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    // the SESSION's split size, not the 128 MB default — an env override
    // (SPARK_GRAFT_MAX_PARTITION_BYTES in JobStats) must not make this
    // guard mis-predict the planned scan splits (ADVICE r16)
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val plannedSplits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    if (bytes <= FanOutCapBytes && plannedSplits < p)
      if (keys.isEmpty) df.repartition(p) else df.repartition(p, keys: _*)
    else df
  }

  /** See [[fanOut]]. */
  val FanOutCapBytes: Long = 256L << 20

  /** [[fanOut]] + ONE eager localCheckpoint — for multi-scan iterative
    * consumers (the refined-quantile family re-reads its base 4-9
    * times: range init + one scan per bracket pass).
    *
    * UNUSED as of r17 — kept as a documented negative result. The r16
    * round shipped this on noisy-window walls after a bare fanOut made
    * the family worse (q150 5.4→12.2 s: every pass re-paid the
    * exchange); the r17 QUIET 32-core JobStats A/B (SPARK_GRAFT_PIN=0
    * toggle) measured the pin losing to PLAIN re-scans across all
    * seven call sites — walls 1.3-2.3× worse and summed task time
    * 10-30× worse (q150: 4.1 s plain vs 111.6 s pinned; q126 0.8 vs
    * 27.4). Re-reading a column-pruned single-row-group parquet
    * projection costs ~30 ms a pass; scanning 32 cached checkpoint
    * partitions costs ~300 ms of task time PER TASK on this container.
    * Size-capped at [[FanOutCapBytes]] (no-op at sf10+), so reverting
    * the call sites changed nothing at the scale tiers. */
  def pinSmall(spark: SparkSession, dir: String, name: String,
      keys: org.apache.spark.sql.Column*)(df: DataFrame): DataFrame = {
    val bytes = bytesOf(spark, dir, name)
    if (bytes <= FanOutCapBytes)
      fanOut(spark, dir, name, keys: _*)(df).localCheckpoint()
    else df
  }

  /** `broadcast(df)` only while the backing table's parquet footprint
    * stays under `capBytes` (default 64 MB compressed ≈ a few hundred
    * MB in-memory) — above it the hint is DROPPED, not honored at any
    * size the way a bare `broadcast()` is, and the join is left to the
    * optimizer: under Bench's scale-raised adaptive threshold AQE
    * re-plans from MEASURED post-shuffle sizes, and a genuinely
    * fact-sized dim falls back to a shuffle join instead of shipping
    * hundreds of MB to every executor (VERDICT r15 item 1: the q105
    * force-broadcast of a 10⁶-row supplier was honored regardless of
    * size while the real melt sat in the unhinted chain). `df` may be
    * a projection/filter of the table; sizing keys on the BASE table's
    * footprint, the conservative upper bound. */
  def broadcastIfUnder(spark: SparkSession, dir: String, name: String,
      capBytes: Long = 64L << 20)(df: DataFrame): DataFrame =
    if (bytesOf(spark, dir, name) <= capBytes)
      org.apache.spark.sql.functions.broadcast(df)
    else df
}
