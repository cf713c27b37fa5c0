package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.ColumnarShuffleCodec

/** Columnar-exchange experiment harness (SURVEY §2A row 25; VERDICT r4
  * item 7). Answers one question with measurements instead of argument:
  * how many shuffle bytes would a columnar exchange serializer (in the
  * spirit of celeborn's CelebornColumnarBatchSerializer.scala:45) save
  * over the row-major UnsafeRow stream Spark ships today?
  *
  * Two measurements, printed as one JSON line:
  *
  *  1. `real_shuffle`: actual bytes written by the q05-shaped range
  *     exchange (full `orders` rows), from task shuffle-write metrics —
  *     anchors the experiment to what the engine's shuffle really costs
  *     under the product session's lz4.
  *  2. `encodings`: per table (orders = dictionary-friendly strings,
  *     lineitem = mostly numeric), the per-partition-encoded sizes of
  *     raw/lz4/zstd × row-major/column-major. Encoding runs inside
  *     `mapPartitions` over the scan RDD — the measurement itself is
  *     distributed, no driver collect of data rows.
  *
  * The keep-or-drop decision lives in BASELINE.md next to the recorded
  * numbers.
  */
object ColumnarBench {

  private def lz4(data: Array[Byte]): Int = {
    // 32 KiB block size = spark.io.compression.lz4.blockSize default
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val os = new net.jpountz.lz4.LZ4BlockOutputStream(bos, 32 * 1024)
    os.write(data); os.close()
    bos.size()
  }

  private def zstd(data: Array[Byte]): Int = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val os = new com.github.luben.zstd.ZstdOutputStream(bos, 1)
    os.write(data); os.close()
    bos.size()
  }

  /** raw/lz4/zstd sizes for both encodings of one table, batched the way
    * a shuffle writer would see rows (per scan partition). */
  private def measure(spark: SparkSession, dir: String, table: String): Map[String, Long] = {
    val df = Tables.t(spark, dir, table)
    val schema = df.schema
    require(ColumnarShuffleCodec.supports(schema), s"$table not columnar-codable")
    val sizes = df.queryExecution.toRdd
      .mapPartitions { it =>
        val rows = it.map(_.copy()).toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val row = ColumnarShuffleCodec.encodeRowMajor(rows, schema)
          val col = ColumnarShuffleCodec.encode(rows, schema)
          Iterator(Array[Long](
            row.length, lz4(row), zstd(row),
            col.length, lz4(col), zstd(col)))
        }
      }
      .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    Map(
      "row_raw" -> sizes(0), "row_lz4" -> sizes(1), "row_zstd" -> sizes(2),
      "col_raw" -> sizes(3), "col_lz4" -> sizes(4), "col_zstd" -> sizes(5))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.env("SPARK_GRAFT_SF_DIR"))
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-columnar-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosConf, "true")
      .config("spark.io.compression.codec", "lz4")
      .config("spark.shuffle.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. real shuffle bytes of the q05-shaped range exchange
    val written = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          written.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    // noop sink: executes the full plan including the range exchange
    // (a bare .count() would let Catalyst eliminate the sort entirely)
    val q05 = Tables.t(spark, dir, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    q05.write.format("noop").mode("overwrite").save()
    // listener bus drain: waitUntilEmpty is private[spark]; poll to a
    // stable value instead (bench harness, not product path)
    var last = -1L
    var tries = 0
    while (written.get() != last && tries < 20) {
      last = written.get(); Thread.sleep(250); tries += 1
    }
    spark.sparkContext.removeSparkListener(listener)
    // counted AFTER the listener is gone: the count's own aggregation
    // shuffle must not contaminate the measured q05 exchange bytes
    val q05Rows = Tables.t(spark, dir, "orders").count()

    // 2. encoding comparison on a string-heavy and a numeric-heavy table
    val tables = Seq("orders", "lineitem")
    val enc = tables.map(t => t -> measure(spark, dir, t)).toMap

    def fmt(m: Map[String, Long]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val encJson = tables.map(t => s""""$t":${fmt(enc(t))}""").mkString("{", ",", "}")
    println(
      s"""{"metric":"columnar_exchange_bytes","real_shuffle_lz4_bytes":${written.get()},""" +
        s""""q05_rows":$q05Rows,"encodings":$encJson}""")
    spark.stop()
  }
}
