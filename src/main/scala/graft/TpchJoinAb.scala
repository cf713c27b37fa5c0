package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B (r16, VERDICT r15 item 1): the sf100 deep-join melt study.
  * q105/q106 fell from broadcast plans to spilling sort-merge chains
  * when their dims crossed the default 10 MB threshold at sf100
  * (r15h: 68x/93x second decade, REAL in quiet re-runs). Two named
  * rungs fix the repeated orderkey join; this harness measures all
  * three plans on the SAME join so the ledger records which rung pays
  * at which scale:
  *
  *   plain  — Spark-default thresholds: the r15 plan (SMJ, both sides
  *            shuffle on every join).
  *   scaled — the r16 Bench protocol (static 384m / adaptive 512m at
  *            sf100 under the 48g driver): dims that fit broadcast,
  *            the fact shuffles only for genuinely fact-sized sides.
  *   bucket — q50's layout at fact scale: lineitem AND orders written
  *            bucketed by orderkey (one ingest shuffle each, timed
  *            separately), then every repeated join on that key reads
  *            co-located buckets with ZERO exchanges. The 100 TB
  *            answer for a key joined many times per day — the build
  *            cost amortizes across repeats, which is why the joined
  *            wall is printed for TWO consecutive runs per variant.
  *
  * The probe join is the q106 kernel: lineitem ⋈ orders on orderkey,
  * revenue by order year. Usage:
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.TpchJoinAb target/sf100"
  * Plan-shape counts (smj/bhj/exchanges) print with each wall so the
  * "no spilling SMJ where a broadcast fits" contract is machine-
  * checkable from the log line.
  */
object TpchJoinAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTITIONS", "320")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_AB_BUCKETS", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.io.compression.codec", "zstd")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def kernel(li: DataFrame, ord: DataFrame): DataFrame =
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(28,4)")).cast("double").as("revenue"))

    def shape(df: DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      def c(pat: String) = pat.r.findAllIn(p).length
      s"smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} " +
        s"exch=${c("Exchange (hash|range)partitioning")}"
    }

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def run(label: String, li: => DataFrame, ord: => DataFrame): Unit = {
      val walls = (1 to 2).map { i =>
        val (df, w) = timed {
          val d = kernel(li, ord)
          d.write.format("noop").mode("overwrite").save(); d
        }
        if (i == 2) println(s"TPCH_JOIN_AB $label plan: ${shape(df)}")
        w
      }
      println(f"TPCH_JOIN_AB $label run1=${walls(0)}%.1f s " +
        f"run2=${walls(1)}%.1f s")
    }

    // plain: the r15 protocol
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
    run("plain", Tables.t(spark, dir, "lineitem"), Tables.t(spark, dir, "orders"))

    // scaled: the r16 Bench protocol at this SF
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "384m")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "512m")
    run("scaled", Tables.t(spark, dir, "lineitem"), Tables.t(spark, dir, "orders"))

    // bucket: one ingest shuffle each side, then exchange-free repeats.
    // merge hint pins the co-located SMJ so the measured repeat is the
    // bucket-reading plan, not a broadcast (orders at sf100 exceeds any
    // sane broadcast; at small SFs the hint keeps the A/B honest).
    val base = java.nio.file.Files.createTempDirectory("graft_tpch_ab")
    val (_, bw) = timed {
      Tables.t(spark, dir, "lineitem")
        .repartition(buckets, col("l_orderkey"))
        .write.mode("overwrite").bucketBy(buckets, "l_orderkey")
        .option("path", s"$base/lineitem").saveAsTable("graft_ab_li")
      Tables.t(spark, dir, "orders")
        .repartition(buckets, col("o_orderkey"))
        .write.mode("overwrite").bucketBy(buckets, "o_orderkey")
        .option("path", s"$base/orders").saveAsTable("graft_ab_ord")
    }
    println(f"TPCH_JOIN_AB bucket build=$bw%.1f s (buckets=$buckets, one-time ingest)")
    run("bucket", spark.table("graft_ab_li").hint("merge"),
      spark.table("graft_ab_ord"))

    // bucket106 (r17, VERDICT r16 item 1): the FULL q106 kernel over
    // the bucketed facts, dims from parquet, under the SessionDefaults
    // tier thresholds (so part/supplier broadcast exactly as in Bench's
    // sf100 run and the orderkey SMJ is the only fact join left — which
    // the bucket layout makes exchange-free). Two consecutive runs: the
    // repeat is the amortized cost a bucketed warehouse actually pays.
    val tier = SessionDefaults.tierFor(Tables.bytesOf(spark, dir, "lineitem"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", tier.bcastStatic)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
      tier.bcastAdaptive)
    spark.conf.set("spark.sql.sources.fileCompressionFactor",
      tier.fileCompressionFactor)
    def q106On(li: DataFrame, ord: DataFrame): DataFrame =
      operators.TpchFull.q106Kernel(
        Tables.t(spark, dir, "part"), li,
        Tables.t(spark, dir, "supplier"), ord,
        Tables.t(spark, dir, "nation"))
    def run106(label: String, li: => DataFrame, ord: => DataFrame): Unit = {
      val walls = (1 to 2).map { i =>
        val (df, w) = timed {
          val d = q106On(li, ord)
          d.write.format("noop").mode("overwrite").save(); d
        }
        if (i == 2) println(s"TPCH_JOIN_AB $label plan: ${shape(df)}")
        w
      }
      println(f"TPCH_JOIN_AB $label run1=${walls(0)}%.1f s " +
        f"run2=${walls(1)}%.1f s")
    }
    run106("q106_plain", Tables.t(spark, dir, "lineitem"),
      Tables.t(spark, dir, "orders"))
    run106("q106_bucket", spark.table("graft_ab_li"),
      spark.table("graft_ab_ord"))

    spark.stop()
  }
}
