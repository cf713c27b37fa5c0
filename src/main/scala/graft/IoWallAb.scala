package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r14 item 8): the sf100 I/O-wall study.
  *
  * r14f adjudicated the anchor's 10.7x second-decade slope as
  * page-cache exit — at sf100 every fact query pays real disk. This
  * harness quantifies how much of that wall a real cluster's columnar
  * discipline recovers, for the two scan-bound anchors (q07 TPC-H Q1,
  * q104 TPC-H Q6), as a codec × layout grid over `lineitem`:
  *
  *   - codec: snappy (the GenScale default) vs zstd parquet pages —
  *     fewer bytes off disk for the same scan;
  *   - layout: as-generated (shipdate scattered across every row
  *     group) vs SORTED by l_shipdate — q104's range predicate can
  *     then skip whole row groups on min/max stats, and q07's ≤
  *     filter skips the tail.
  *
  * Each variant directory holds only lineitem.parquet (both queries
  * read nothing else). Every timed run drops the OS page cache first
  * (`sync; echo 3 > /proc/sys/vm/drop_caches` — root-only, fine in the
  * build container), so the numbers are the COLD story the wall is
  * about. One run per cell (cold runs cannot be warmed-median).
  *
  * `runMain graft.IoWallAb [sf100dir]` — results ledgered in
  * BASELINE.md r15.
  */
object IoWallAb {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("target/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Paths.get("target/io_wall")
    java.nio.file.Files.createDirectories(base)
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")

    /** Build variant dir (lineitem only) if absent; return its path.
      * ATOMIC (ADVICE r15): the rewrite lands in a `.tmp` sibling and
      * renames into place only on success — a crash mid-write cannot
      * leave a partial lineitem.parquet that a later run silently
      * measures (wrong bytes AND wrong wall, one cold run per cell).
      * A leftover `.tmp` from a crashed run is discarded and rebuilt. */
    def variant(name: String, codec: String, sorted: Boolean): String = {
      val dir = base.resolve(name)
      val out = dir.resolve("lineitem.parquet")
      if (!java.nio.file.Files.exists(out)) {
        java.nio.file.Files.createDirectories(dir)
        val tmp = dir.resolve("lineitem.parquet.tmp")
        val df =
          if (sorted)
            // range-partition + within-partition sort: every row group
            // covers a narrow l_shipdate span, so min/max stats prune
            li.repartitionByRange(32, col("l_shipdate"))
              .sortWithinPartitions(col("l_shipdate"))
          else li
        df.write.mode("overwrite").option("compression", codec)
          .parquet(tmp.toString)
        require(java.nio.file.Files.exists(tmp.resolve("_SUCCESS")),
          s"variant $name write finished without _SUCCESS")
        java.nio.file.Files.move(tmp, out,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      dir.toString
    }

    def bytesOf(dir: String): Long = {
      val d = new java.io.File(s"$dir/lineitem.parquet")
      Option(d.listFiles()).map(_.map(_.length).sum).getOrElse(0L)
    }

    def dropCaches(): Unit = {
      val p = new ProcessBuilder("sh", "-c",
        "sync; echo 3 > /proc/sys/vm/drop_caches").inheritIO().start()
      require(p.waitFor() == 0, "drop_caches failed")
    }

    // snappy_raw IS the generated corpus — no copy; optional env
    // SPARK_GRAFT_IOWALL_VARIANTS limits the grid (a sorted rewrite of
    // 600M rows is its own multi-minute job)
    val sel = sys.env.get("SPARK_GRAFT_IOWALL_VARIANTS")
      .map(_.split(",").map(_.trim).toSet)
    val variants = Seq(
      ("zstd_raw", "zstd", false),
      ("snappy_sorted", "snappy", true),
      ("zstd_sorted", "zstd", true))
    val dirs = ("snappy_raw" -> srcDir) +: variants
      .filter { case (nm, _, _) => sel.forall(_.contains(nm)) }
      .map { case (nm, c, s) => nm -> variant(nm, c, s) }

    // ADVICE r15: one cold run per cell in a container with ±30% noisy
    // windows can pin a wrong codec/layout conclusion — each cell now
    // runs SPARK_GRAFT_IOWALL_RUNS cold repetitions (default 2, caches
    // dropped before each) and prints every rep plus the min; the min
    // is the honest cold-wall estimator under one-sided noise.
    val reps = sys.env.getOrElse("SPARK_GRAFT_IOWALL_RUNS", "2").toInt
    for ((nm, dir) <- dirs; q <- Seq("q07_tpch_q1", "q104_tpch_q6")) {
      val walls = (1 to reps).map { _ =>
        dropCaches()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"IO_WALL variant=$nm query=$q cold_s=${walls.min}%.2f " +
        f"runs=${walls.map(w => f"$w%.2f").mkString("/")} " +
        f"bytes=${bytesOf(dir) / 1e9}%.2f GB")
    }
    spark.stop()
  }
}
