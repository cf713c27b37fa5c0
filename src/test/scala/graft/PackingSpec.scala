package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing (q56): conservation and exact-fill invariants, and
  * the two-phase prefix sum must equal the single-block (global) one.
  */
class PackingSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.t(spark, "/root/testdata/sf0.01", "documents")

  test("interior windows are exactly full and token totals are conserved") {
    val cap = 256L
    val out = operators.Packing.packWindows(docs, cap).cache()
    try {
      val lastW = out.agg(max(col("window_id"))).head().getLong(0)
      val interiorNotFull = out
        .where(col("window_id") < lastW && col("n_tokens") =!= cap)
      assert(interiorNotFull.isEmpty)
      val packed = out.agg(sum(col("n_tokens"))).head().getLong(0)
      val corpus = docs.select(size(split(col("text"), " ")).cast("long").as("n"))
        .agg(sum(col("n"))).head().getLong(0)
      assert(packed == corpus)
      // doc ranges tile the corpus in order: next window starts where
      // the previous ended (same doc when it straddles the boundary)
      val rows = out.orderBy(col("window_id")).collect()
      rows.sliding(2).foreach { case Array(a, b) =>
        assert(b.getAs[Long]("min_doc") == a.getAs[Long]("max_doc")
          || b.getAs[Long]("min_doc") == a.getAs[Long]("max_doc") + 1)
      }
    } finally out.unpersist()
  }

  test("blocked prefix sum equals the single-block global sum") {
    val tiny = operators.Packing.packWindows(docs, 128L, blockSize = 32L)
    val global = operators.Packing.packWindows(docs, 128L, blockSize = 1L << 40)
    assert(tiny.exceptAll(global).isEmpty && global.exceptAll(tiny).isEmpty)
  }
}
