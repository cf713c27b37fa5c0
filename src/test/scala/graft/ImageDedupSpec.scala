package graft

import org.scalatest.funsuite.AnyFunSuite

/** Perceptual image dedup (q97): the dHash must be exactly invariant
  * under uniform brightness shift (the perceptual property md5 lacks),
  * the banded pairing must equal brute force (pigeonhole losslessness,
  * proven differentially), and the planted variant pairs must all be
  * recovered on the fixture. */
class ImageDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import operators.ImageDedup

  /** In-test PNG with channels from a clip-free formula (≤ 215), plus
    * an optional uniform +40 brightness shift on all three channels. */
  private def png(w: Int, h: Int, shift: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 31 + y * 7) % 200 + shift
      val g = (x * 13 + y * 29) % 200 + shift
      val b = (x * 5 + y * 17) % 200 + shift
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash is exactly invariant under uniform brightness shift") {
    val base = ImageDedup.dhashBits(png(40, 30, 0))
    val bright = ImageDedup.dhashBits(png(40, 30, 40))
    assert(base == bright, s"dHash moved under +40 brightness:\n$base\n$bright")
    // while the byte-level fingerprint (exact-dedup's key) changes
    assert(!java.util.Arrays.equals(png(40, 30, 0), png(40, 30, 40)))
  }

  test("banded pairing equals brute force (pigeonhole losslessness)") {
    import spark.implicits._
    // unpersist in finally: a cache left behind would be silently
    // substituted (CacheManager plan matching) into every later query
    // over the same subplan — q97's plan-contract shape included
    val imgs = ImageDedup.imageTable(spark, sf).cache()
    try {
      val got = ImageDedup.phashPairs(spark, imgs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val bits = imgs.map(r => (r.media_id, ImageDedup.dhashBits(r.payload)))
        .collect()
      val want = (for {
        (a, ab) <- bits; (b, bb) <- bits if a < b
        d = ab.zip(bb).count { case (x, y) => x != y } if d <= 7
      } yield (a, b, d.toLong)).toSet
      assert(got == want, s"missed=${want.diff(got)} spurious=${got.diff(want)}")
    } finally imgs.unpersist(blocking = true)
  }

  test("wide 256-bit dHash is also exactly invariant under brightness") {
    val base = ImageDedup.dhashBits(png(40, 30, 0), 16, 17)
    val bright = ImageDedup.dhashBits(png(40, 30, 40), 16, 17)
    assert(base.length == 256)
    assert(base == bright)
  }

  test("wide banded pairing equals brute force at the 16x17 grid") {
    import spark.implicits._
    val imgs = ImageDedup.imageTable(spark, sf).cache()
    try {
      val got = ImageDedup.phashPairs(spark, imgs,
          gridRows = 16, gridCols = 17)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val bits = imgs.map(r =>
          (r.media_id, ImageDedup.dhashBits(r.payload, 16, 17)))
        .collect()
      val want = (for {
        (a, ab) <- bits; (b, bb) <- bits if a < b
        d = ab.zip(bb).count { case (x, y) => x != y } if d <= 7
      } yield (a, b, d.toLong)).toSet
      assert(got == want, s"missed=${want.diff(got)} spurious=${got.diff(want)}")
    } finally imgs.unpersist(blocking = true)
  }

  test("wide layout recovers every planted variant pair too") {
    val pairs = SparkEntry.queries("q97_phash_wide")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Tables.t(spark, sf, "documents")
      .where(org.apache.spark.sql.functions.expr("doc_id % 45 = 0"))
      .collect().map(_.getAs[Long]("doc_id"))
      .map(d => (d * 2, d * 2 + 1)).toSet
    assert(planted.nonEmpty)
    assert(planted.subsetOf(pairs),
      s"missed planted pairs: ${planted.diff(pairs)}")
  }

  test("every planted variant pair is recovered") {
    val pairs = SparkEntry.queries("q97_phash_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Tables.t(spark, sf, "documents")
      .where(org.apache.spark.sql.functions.expr("doc_id % 45 = 0"))
      .collect().map(_.getAs[Long]("doc_id"))
      .map(d => (d * 2, d * 2 + 1)).toSet
    assert(planted.nonEmpty, "fixture planted no variants")
    assert(planted.subsetOf(pairs),
      s"missed planted pairs: ${planted.diff(pairs)}")
  }
}
