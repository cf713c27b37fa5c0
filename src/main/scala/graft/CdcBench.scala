package graft

import org.apache.spark.sql.SparkSession

/** A/B benchmark for the CDC cut-point hash (same keep-or-drop protocol
  * as ColumnarBench): times `Dedup.cdcChunks` (native rolling-hash
  * `cdc_cuts`, O(1)/char) against `Dedup.cdcChunksDeclarative`
  * (built-in `filter`/`aggregate` exprs, O(W)/char) on the documents
  * table at SPARK_GRAFT_SF_DIR. Both sides run the identical downstream
  * (count of produced chunks), warm-up + median of SPARK_GRAFT_BENCH_RUNS
  * (default 3). Prints one JSON line. Decision recorded in BASELINE.md.
  */
object CdcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").cache()
    docs.count() // materialize: time the chunking, not the scan

    def time(side: String): Double = {
      def once(): Double = {
        val df = side match {
          case "native" => operators.Dedup.cdcChunks(docs)
          case _        => operators.Dedup.cdcChunksDeclarative(docs)
        }
        val t0 = System.nanoTime()
        df.selectExpr("count(chunk)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val xs = Seq.fill(runs)(once()).sorted
      xs(xs.size / 2)
    }

    val native = time("native")
    val decl = time("declarative")
    println(f"""{"metric":"cdc_chunk_sec","sf_dir":"$sfDir","native":$native%.3f,"declarative":$decl%.3f,"speedup":${decl / native}%.2f}""")
    docs.unpersist()
    spark.stop()
  }
}
