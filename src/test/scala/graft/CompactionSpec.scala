package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction (q65): the layout contract — bounded file sizes, disjoint
  * per-file key ranges (range clustering), rows sorted within files.
  */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("compacted layout: capped files, disjoint sorted key ranges") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_compaction_spec").toString
    val src = Tables.t(spark, sf, "orders")
    operators.Compaction.compactByRange(src, "o_orderkey",
      nFiles = 4, maxRecordsPerFile = 1000L, out = out)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length >= 4) // 4 range partitions, split further by the cap
    val stats = files.map { f =>
      val d = spark.read.parquet(f)
      val r = d.agg(count(lit(1)), min(col("o_orderkey")), max(col("o_orderkey"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), f)
    }
    // every file within the record cap
    assert(stats.forall(_._1 <= 1000L))
    // key ranges are disjoint across files once ordered by min key
    val byMin = stats.sortBy(_._2)
    byMin.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 < b._2, s"overlapping ranges: $a vs $b")
    }
    // rows inside a file are sorted by the key
    val first = spark.read.parquet(byMin.head._4)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(first.sameElements(first.sorted))
    // nothing lost
    assert(spark.read.parquet(out).count() == src.count())
  }
}
