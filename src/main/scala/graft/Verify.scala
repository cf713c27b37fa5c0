package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional trailing args: restrict the dump to the named queries
    // (dev iteration with tools/check.py; the driver passes exactly two)
    val Array(sfDir, outDir) = args.take(2)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      // same shuffle-integrity confs as Bench (see CodecSpec); zstd per
      // the round-5 columnar/codec experiment in BASELINE.md
      .config("spark.io.compression.codec", "zstd")
      .config("spark.shuffle.checksum.enabled", "true")
      .config("spark.shuffle.spill.compress", "true")
      .config("spark.shuffle.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query observability export (observed metrics + shuffle bill)
    // + one EXECUTED-plan artifact per query — written to a SIBLING
    // directory (`<outDir>_plans`), never inside outDir: the driver
    // enumerates outDir as one-parquet-dir-per-query, and anything else
    // there shows up as a spurious error row in CORRECTNESS_r*.json.
    Metrics.install(spark, Some(s"${outDir}_plans/metrics.jsonl"),
      plansDir = Some(s"${outDir}_plans"))
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      Metrics.tagQuery(name)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Metrics.awaitQuiesce() // async listener bus: let metrics.jsonl flush
    spark.stop()
  }
}
