package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Image near-duplicate detection by perceptual difference-hash (dHash)
  * over REAL decoded PNGs — the multimodal twin of the text near-dup
  * family (q27/q28): re-encodes, crops, and brightness shifts defeat
  * `md5(payload)` exact dedup (q34_media_meta's checksum), while a
  * perceptual hash keys on image CONTENT.
  *
  * dHash here is integer-exact end to end, so the whole pipeline has a
  * DuckDB oracle like q34_png_decode: decode the PNG (javax.imageio on
  * the executor), grid the r+g+b luminance into 8 rows × 9 columns of
  * block SUMS (gx = x·9 / w — no interpolation, no floats), emit bit
  * (gy, gx) = [mean(block gx) > mean(block gx+1)] via the exact integer
  * cross-product s₁·c₂ > s₂·c₁, 64 bits total. A uniform brightness
  * shift adds the same constant to every block mean, so the comparisons
  * — and the hash — are EXACTLY invariant (proven in ImageDedupSpec);
  * random images differ in ~32 bits.
  *
  * Scale shape: hashing is a map-only typed `mapPartitions` decode (the
  * mapInPandas batch shape, reader SPI resolved once per JVM); pairing
  * is pigeonhole band blocking — 8 bands × 8 bits, so ANY pair within
  * Hamming ≤ 7 shares a verbatim band (lossless by construction, the
  * q62 PassJoin argument, not a probabilistic LSH bound) and only
  * band-equal candidates are ever verified. No all-pairs stage at any
  * scale; hot bands are impossible because band keys are 8 pseudorandom
  * bits of content (≤ 256 keys per band saturate only past ~10⁵ images,
  * at which point a doc-frequency cap like q27's dfCap applies).
  *
  * The fixture plants near-dup pairs: every 3rd image gets a variant
  * copy with ~1 % of pixels channel-shifted — block sums barely move,
  * so variants sit a few dHash bits from their base while unrelated
  * images stay ~32 bits apart.
  */
object ImageDedup {

  private val MaxHamming = 7 // pigeonhole-lossless with 8 bands × 8 bits

  final case class ImgRec(media_id: Long, payload: Array[Byte])
  final case class ImgBits(media_id: Long, bits: String)

  /** Deterministic PNG variant: the q34 pixel formula, with the red
    * channel of every 101st pixel shifted by +40 (mod 256) when
    * `perturbed` — a sparse content edit, not a uniform relight. */
  def encodePngVariant(docId: Long, w: Int, h: Int,
      perturbed: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r0 = ((docId * 7 + x * 3 + y * 5) % 256).toInt
        val r = if (perturbed && (y.toLong * w + x) % 101 == 0)
          (r0 + 40) % 256 else r0
        val g = ((docId * 11 + x * 13 + y * 2) % 256).toInt
        val b = ((docId * 3 + x + y * 17) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = Multimodal.pngWriterSpi.createWriterInstance()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** 64-bit dHash of a PNG payload as a '0'/'1' string (bit (gy, gx) at
    * index gy·8 + gx). Integer-exact: block sums + cross-multiplied
    * mean comparison, no division, no floats. */
  def dhashBits(payload: Array[Byte]): String = {
    val reader = Multimodal.pngReaderSpi.createReaderInstance()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val img = try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally { reader.dispose(); iis.close() }
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val s = Array.ofDim[Long](8, 9)
    val c = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 9 / w
        val rgb = img.getRGB(x, y)
        s(gy)(gx) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        c(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        sb.append(
          if (s(gy)(gx) * c(gy)(gx + 1) > s(gy)(gx + 1) * c(gy)(gx)) '1'
          else '0')
        gx += 1
      }
      gy += 1
    }
    sb.toString
  }

  /** PUBLIC API — near-dup image pairs (a_id, b_id, hamming ≤ `maxHamming`)
    * over (media_id, payload) rows. maxHamming ≤ 7 keeps the band
    * blocking provably lossless. */
  def phashPairs(spark: SparkSession, imgs: Dataset[ImgRec],
      maxHamming: Int = MaxHamming): DataFrame = {
    import spark.implicits._
    require(maxHamming <= MaxHamming,
      s"band blocking is lossless only up to hamming $MaxHamming")
    val bits = imgs.mapPartitions(_.map(r =>
      ImgBits(r.media_id, dhashBits(r.payload)))).toDF()
    val bands = bits.select(col("media_id"), col("bits"),
        explode(array((0 until 8).map(b =>
          struct(lit(b).as("band"),
            substring(col("bits"), b * 8 + 1, 8).as("bk"))): _*)).as("bb"))
      .select(col("media_id"), col("bits"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    // Saturated-band regime (found by the r13 sf10 decade run): past
    // ~10^5 images the 256 keys per band saturate and the band join
    // fans out to Σ bucket² candidate pairs (~44 M at 53 k images).
    // Two rules keep that regime cheap: (1) verify with
    // bit_count(xor) over the hash packed into ONE long — a codegen
    // integer op, not the 64-char string lambda this path shipped with
    // — and (2) verify BEFORE deduplicating, so the ≤7-hamming
    // survivors (tiny by construction) are all that ever shuffles; the
    // candidate stream itself pipes map-side from the join. Losslessness
    // is untouched (every candidate is still verified exactly). The
    // remaining quadratic Σ bucket² term is inherent to a 64-bit hash
    // with h = 7 (pigeonhole needs 8 bands ⇒ 8-bit keys); the 10^8-image
    // scale path is a wider perceptual hash (256-bit ⇒ 32-bit band
    // keys), not a band cap — a cap would break the no-miss guarantee.
    // pack as two 32-bit halves + shift: conv() of all 64 bits returns
    // a string whose high-bit values overflow the signed-long cast
    val packed = bands.withColumn("h",
      expr("shiftleft(cast(conv(substring(bits, 1, 32), 2, 10) as bigint), 32)" +
        " | cast(conv(substring(bits, 33, 32), 2, 10) as bigint)"))
    packed.as("x").join(packed.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a_id"), col("y.media_id").as("b_id"),
        expr("bit_count(x.h ^ y.h)").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("a_id").asc_nulls_last, col("b_id").asc_nulls_last,
        col("hamming").asc_nulls_last)
  }

  /** Image fixture with planted near-dups: one real PNG per
    * doc_id ≡ 0 (mod 15) (media_id = 2·doc_id), plus a perturbed
    * variant copy for doc_id ≡ 0 (mod 45) (media_id = 2·doc_id + 1). */
  def imageTable(s: SparkSession, dir: String): Dataset[ImgRec] = {
    import s.implicits._
    val base = Tables.t(s, dir, "documents")
      .where(col("doc_id") % 15 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 64).cast("int").as("w"),
        (lit(16) + col("doc_id") % 48).cast("int").as("h"),
        lit(false).as("pert"))
    val variants = Tables.t(s, dir, "documents")
      .where(col("doc_id") % 45 === 0)
      .select(col("doc_id"),
        (lit(16) + col("doc_id") % 64).cast("int").as("w"),
        (lit(16) + col("doc_id") % 48).cast("int").as("h"),
        lit(true).as("pert"))
    base.unionAll(variants).as[(Long, Int, Int, Boolean)]
      .map { case (id, w, h, pert) =>
        ImgRec(id * 2 + (if (pert) 1 else 0),
          encodePngVariant(id, w, h, pert)) }
  }

  private def q97(s: SparkSession, dir: String): DataFrame =
    phashPairs(s, imageTable(s, dir))

  /** Oracle: replay the pixel formula + perturbation, the block-sum
    * grid, the bit rule, and EXHAUSTIVE all-pairs Hamming in SQL — the
    * banded Spark path must equal it exactly (pigeonhole losslessness
    * is thereby driver-checked, not just argued). */
  private val q97Sql =
    s"""WITH img AS (
       |  SELECT doc_id * 2 AS media_id, doc_id, 0 AS pert,
       |    CAST(16 + doc_id % 64 AS INT) AS w, CAST(16 + doc_id % 48 AS INT) AS h
       |  FROM documents WHERE doc_id % 15 = 0
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, doc_id, 1,
       |    CAST(16 + doc_id % 64 AS INT), CAST(16 + doc_id % 48 AS INT)
       |  FROM documents WHERE doc_id % 45 = 0),
       |e AS (
       |  SELECT media_id, doc_id, pert, w, h,
       |    unnest(generate_series(0, w * h - 1)) AS i FROM img),
       |px AS (
       |  SELECT media_id, w, h, i % w AS x, i // w AS y,
       |    CASE WHEN pert = 1 AND i % 101 = 0
       |      THEN ((doc_id * 7 + (i % w) * 3 + (i // w) * 5) % 256 + 40) % 256
       |      ELSE (doc_id * 7 + (i % w) * 3 + (i // w) * 5) % 256 END
       |    + (doc_id * 11 + (i % w) * 13 + (i // w) * 2) % 256
       |    + (doc_id * 3 + (i % w) + (i // w) * 17) % 256 AS lum
       |  FROM e),
       |blk AS (
       |  SELECT media_id, (x * 9) // w AS gx, (y * 8) // h AS gy,
       |    SUM(lum) AS s, COUNT(*) AS c
       |  FROM px GROUP BY 1, 2, 3),
       |bit AS (
       |  SELECT a.media_id, a.gy, a.gx,
       |    CASE WHEN a.s * b.c > b.s * a.c THEN '1' ELSE '0' END AS bch
       |  FROM blk a JOIN blk b
       |    ON a.media_id = b.media_id AND a.gy = b.gy AND b.gx = a.gx + 1
       |  WHERE a.gx < 8),
       |bits AS (
       |  SELECT media_id, string_agg(bch, '' ORDER BY gy, gx) AS bs
       |  FROM bit GROUP BY media_id),
       |ham AS (
       |  SELECT a.media_id AS a_id, b.media_id AS b_id,
       |    SUM(CASE WHEN substr(a.bs, CAST(i + 1 AS INT), 1)
       |             <> substr(b.bs, CAST(i + 1 AS INT), 1)
       |        THEN 1 ELSE 0 END) AS hamming
       |  FROM bits a JOIN bits b ON a.media_id < b.media_id
       |  CROSS JOIN range(64) t(i)
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id, CAST(hamming AS BIGINT) AS hamming
       |FROM ham WHERE hamming <= $MaxHamming
       |ORDER BY a_id ASC NULLS LAST, b_id ASC NULLS LAST,
       |  hamming ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q97_phash_dedup", q97, Some(q97Sql)))
}
