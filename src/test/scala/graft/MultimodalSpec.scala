package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal pipeline's distributed plumbing: typed schema, stubbed
  * decode determinism, and agreement with a local recomputation. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("decode pipeline matches local recomputation over the payloads") {
    import spark.implicits._
    val fromPipeline = Multimodal.decodePipeline(spark, sf)
      .collect().map(f => f.doc_id -> f).toMap
    val local = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        id -> (bytes.length,
          bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length / 255.0,
          bytes.length / 64 + 1)
      }.toMap
    assert(fromPipeline.keySet == local.keySet)
    fromPipeline.foreach { case (id, f) =>
      val (n, bright, frames) = local(id)
      assert(f.n_bytes == n && f.brightness == bright && f.n_frames == frames,
        s"doc $id mismatch")
    }
  }

  test("media table has the declared schema") {
    val schema = Multimodal.mediaTable(spark, sf).schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_type").dataType.typeName == "string")
    assert(schema("width").dataType.typeName == "integer")
  }

  test("decode aggregate is deterministic across runs") {
    val a = SparkEntry.queries("q34_media_decode")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q34_media_decode")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("resize stub fits the 32x32 box and preserves orientation") {
    def rec(w: Int, h: Int) =
      Multimodal.MediaRecord(1L, Array.fill(200)(65.toByte), "image", w, h)
    val square = Multimodal.resizeSample(rec(40, 40))
    assert(square.rw == 32 && square.rh == 32)
    val wide = Multimodal.resizeSample(rec(64, 16))
    assert(wide.rw == 32 && wide.rh == 8)
    val tall = Multimodal.resizeSample(rec(16, 64))
    assert(tall.rw == 8 && tall.rh == 32)
    val sliver = Multimodal.resizeSample(rec(1, 79))
    assert(sliver.rw == 1 && sliver.rh == 32) // min-1 clamp
    // frame sampling: 200 bytes -> 4 frames -> ceil(4/3) = 2 kept
    assert(square.n_frames == 4 && square.n_kept == 2)
  }

  test("resize pipeline agrees with the row-level stub") {
    val out = SparkEntry.queries("q34_media_resize")(spark, sf).collect()
    assert(out.length > 0)
    out.foreach { r =>
      val rw = r.getAs[Int]("rw"); val rh = r.getAs[Int]("rh")
      assert(rw >= 1 && rw <= 32 && rh >= 1 && rh <= 32)
      assert(rw == 32 || rh == 32) // long side always hits the box
      assert(r.getAs[Int]("n_kept") == (r.getAs[Int]("n_frames") + 2) / 3)
    }
  }

  test("corpus pipeline conserves documents across confusion cells") {
    import org.apache.spark.sql.functions._
    val cells = SparkEntry.queries("q35_corpus_pipeline")(spark, sf)
    val kept = cells.agg(sum("n_docs")).collect()(0).getLong(0)
    val total = Tables.t(spark, sf, "documents").count()
    assert(kept > 0 && kept <= total,
      s"kept $kept of $total docs (filter + dedup can only shrink)")
    // every labeled lang that survives the filter appears exactly once
    // per predicted lang: cells are unique
    assert(cells.select("lang", "pred_lang").distinct().count() == cells.count())
  }
}
