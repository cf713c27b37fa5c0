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

  test("PNG decode is REAL: javax.imageio round-trips the deterministic image") {
    // encode -> decode through the actual JDK PNG codec and check the
    // decoded pixels against the generation formula, pixel by pixel
    val (id, w, h) = (42L, 20, 13)
    val png = Multimodal.encodePng(id, w, h)
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47),
      "payload is not a PNG")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == w && img.getHeight == h)
    var expected = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((id * 7 + x * 3 + y * 5) % 256).toInt
      val g = ((id * 11 + x * 13 + y * 2) % 256).toInt
      val b = ((id * 3 + x + y * 17) % 256).toInt
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == r && ((rgb >> 8) & 0xff) == g && (rgb & 0xff) == b,
        s"pixel ($x,$y) mismatch after PNG round trip")
      expected += r + g + b
    }
    val stats = Multimodal.decodeImageStats(
      Multimodal.MediaRecord(id, png, "image", w, h))
    assert(stats.width == w && stats.height == h && stats.lum_sum == expected)
  }

  test("decodeFrame routes PNG payloads through the real decoder") {
    val (id, w, h) = (7L, 16, 16)
    val png = Multimodal.encodePng(id, w, h)
    val f = Multimodal.decodeFrame(Multimodal.MediaRecord(id, png, "image", w, h))
    val stats = Multimodal.decodeImageStats(
      Multimodal.MediaRecord(id, png, "image", w, h))
    assert(f.width == w && f.height == h && f.n_frames == 1)
    assert(f.brightness == stats.lum_sum.toDouble / (w.toLong * h * 3) / 255.0)
    // non-PNG payloads still take the documented stub arm
    val stub = Multimodal.decodeFrame(
      Multimodal.MediaRecord(id, "hello".getBytes("UTF-8"), "audio", w, h))
    assert(stub.n_frames == "hello".length / 64 + 1)
  }

  test("q34_png_decode distributed pipeline matches driver-side decode") {
    val out = SparkEntry.queries("q34_png_decode")(spark, sf).collect()
    assert(out.nonEmpty)
    out.take(5).foreach { row =>
      val id = row.getLong(0)
      val (w, hh) = ((16 + id % 64).toInt, (16 + id % 48).toInt)
      val stats = Multimodal.decodeImageStats(
        Multimodal.MediaRecord(id, Multimodal.encodePng(id, w, hh), "image", w, hh))
      assert(row.getInt(1) == stats.width && row.getInt(2) == stats.height
        && row.getLong(3) == stats.lum_sum, s"doc $id mismatch")
    }
  }

  test("WAV decode is REAL: javax.sound.sampled round-trips the deterministic clip") {
    // encode -> decode through the actual JDK WAVE codec and check the
    // decoded samples against the generation formula, sample by sample
    val (id, ns) = (43L, 100)
    val wav = Multimodal.encodeWav(id, ns)
    assert(wav.take(4).map(_.toChar).mkString == "RIFF" &&
      wav.slice(8, 12).map(_.toChar).mkString == "WAVE",
      "payload is not a RIFF/WAVE container")
    val stats = Multimodal.decodeWavStats(
      Multimodal.MediaRecord(id, wav, "audio", 0, 0))
    var (sum, sq) = (0L, 0L)
    for (i <- 0 until ns) {
      val amp = (id * 31 + i.toLong * 17) % 65536 - 32768
      sum += amp; sq += amp * amp
    }
    assert(stats.sample_rate == 8000 && stats.n_channels == 1)
    assert(stats.n_samples == ns && stats.amp_sum == sum && stats.amp_sq_sum == sq)
  }

  test("decodeFrame routes WAV payloads through the real decoder") {
    val (id, ns) = (13L, 200)
    val wav = Multimodal.encodeWav(id, ns)
    val f = Multimodal.decodeFrame(Multimodal.MediaRecord(id, wav, "audio", 0, 0))
    val stats = Multimodal.decodeWavStats(
      Multimodal.MediaRecord(id, wav, "audio", 0, 0))
    assert(f.n_frames == ns)
    assert(f.brightness ==
      math.sqrt(stats.amp_sq_sum.toDouble / stats.n_samples) / 32768.0)
    // non-WAV audio payloads still take the documented stub arm
    val stub = Multimodal.decodeFrame(
      Multimodal.MediaRecord(id, "hello".getBytes("UTF-8"), "audio", 0, 0))
    assert(stub.n_frames == "hello".length / 64 + 1)
  }

  test("video container round-trips: parse + frame-sample + real PNG decode per frame") {
    val (id, nf, w, h) = (44L, 7, 8, 6)
    val video = Multimodal.encodeVideo(id, nf, w, h)
    assert(video.take(4).map(_.toChar).mkString == "GFV1")
    val stats = Multimodal.decodeVideoStats(
      Multimodal.MediaRecord(id, video, "video", w, h))
    // sampled frames 0, 3, 6 — recompute their lum sums from the formula
    var expected = 0L
    for (f <- Seq(0, 3, 6); y <- 0 until h; x <- 0 until w) {
      val k = id * 1000 + f
      expected += ((k * 7 + x * 3 + y * 5) % 256) +
        ((k * 11 + x * 13 + y * 2) % 256) + ((k * 3 + x + y * 17) % 256)
    }
    assert(stats.n_frames == nf && stats.n_sampled == 3)
    assert(stats.width == w && stats.height == h)
    assert(stats.lum_sum == expected)
  }

  test("q34_video_frames distributed pipeline matches driver-side decode") {
    val out = SparkEntry.queries("q34_video_frames")(spark, sf).collect()
    assert(out.nonEmpty)
    out.take(5).foreach { row =>
      val id = row.getLong(0)
      val nf = (3 + id % 6).toInt
      val stats = Multimodal.decodeVideoStats(
        Multimodal.MediaRecord(id, Multimodal.encodeVideo(id, nf, 8, 6), "video", 8, 6))
      assert(row.getInt(1) == stats.n_frames && row.getInt(2) == stats.n_sampled
        && row.getLong(5) == stats.lum_sum, s"doc $id mismatch")
    }
  }

  test("q34_wav_decode distributed pipeline matches driver-side decode") {
    val out = SparkEntry.queries("q34_wav_decode")(spark, sf).collect()
    assert(out.nonEmpty)
    out.take(5).foreach { row =>
      val id = row.getLong(0)
      val ns = (64 + id % 256).toInt
      val stats = Multimodal.decodeWavStats(
        Multimodal.MediaRecord(id, Multimodal.encodeWav(id, ns), "audio", 0, 0))
      assert(row.getInt(1) == 8000 && row.getInt(2) == 1
        && row.getLong(3) == stats.n_samples
        && row.getLong(4) == stats.amp_sum
        && row.getLong(5) == stats.amp_sq_sum, s"doc $id mismatch")
    }
  }
}
