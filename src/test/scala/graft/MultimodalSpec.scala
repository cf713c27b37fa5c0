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
}
