package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the perceptual-hash width A/B behind the q97 decade
  * adjudication. The registry fixture cannot separate the layouts
  * asymptotically: GenScale replication + the mod-768 pixel formula
  * cap the corpus at 256 DISTINCT image classes, so the true ham-0
  * pair count (and with it both layouts' walls) grows quadratically in
  * the copy count — the answer is quadratic, like q28_dedup_embed's
  * adjudication. This main synthesizes n DISTINCT hashes instead
  * (xxhash64-derived bits — every doc unique), plants a 3-bit-flip
  * variant for every 3rd doc, and drives [[operators.ImageDedup
  * .bandedHammingPairs]] directly at both widths, so the ledger can
  * show the saturation term itself: the 64-bit layout's 8-bit band
  * keys birthday-saturate past ~10⁵ images (candidate mass ~ n²/256
  * per band) while the 256-bit layout's 32-bit keys keep candidates ~
  * answer-bound at every measured n.
  *
  * `runMain graft.PhashAb [n]` — n distinct base images (default
  * 100000); variants add n/3 more rows.
  */
object PhashAb {
  /** Deterministic '0'/'1' hash string of `nBits` from xxhash64 words;
    * `flips` > 0 flips that many distinct bit positions (also
    * hash-derived) — a planted near-dup variant. */
  private def bitsExpr(nBits: Int, flips: Int) = {
    // word w of the base hash: 64 bits of xxhash64(doc_id, w)
    val words = nBits / 64
    // hex() prints the long as 16 unsigned hex chars, so conv(…,16,2)
    // never sees a negative decimal string
    val base = (0 until words).map(w =>
      s"lpad(conv(hex(xxhash64(cast(id as string), $w)), 16, 2), 64, '0')")
      .mkString("concat(", ", ", ")")
    if (flips == 0) expr(base)
    else {
      // flip bit positions xxhash64(id, 100+f) % nBits, f = 0..flips-1
      // (collisions between flip positions leave fewer than `flips`
      // flipped bits — still a ≤ flips near-dup, fine for the A/B)
      val flipped = (0 until flips).foldLeft(base) { (acc, f) =>
        val pos = s"(pmod(xxhash64(cast(id as string), ${100 + f}), $nBits) + 1)"
        s"concat(substring($acc, 1, $pos - 1), " +
          s"cast(1 - cast(substring($acc, $pos, 1) as int) as string), " +
          s"substring($acc, $pos + 1, $nBits))"
      }
      expr(flipped)
    }
  }

  private def corpus(spark: SparkSession, n: Long, nBits: Int): DataFrame = {
    val base = spark.range(n).select((col("id") * 2).as("media_id"),
      bitsExpr(nBits, 0).as("bits"))
    val variants = spark.range(n).where(col("id") % 3 === 0)
      .select((col("id") * 2 + 1).as("media_id"), bitsExpr(nBits, 3).as("bits"))
    base.unionAll(variants)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String, nBits: Int): Unit = {
      val bits = corpus(spark, n, nBits).localCheckpoint()
      def once(): Long = operators.ImageDedup
        .bandedHammingPairs(spark, bits, nBits, nBands = 8, maxHamming = 7)
        .count()
      once() // warm
      val t0 = System.nanoTime()
      val pairs = once()
      val wall = (System.nanoTime() - t0) / 1e9
      // candidate mass = Σ C(bucket, 2) over (band, key) buckets
      val bandBits = nBits / 8
      val mass = bits.select(posexplode(array((0 until 8).map(b =>
          substring(col("bits"), b * bandBits + 1, bandBits)): _*))
          .as(Seq("band", "bk")))
        .groupBy("band", "bk").count()
        .agg(sum(expr("count * (count - 1) / 2")).cast("long"))
        .head().getLong(0)
      println(f"PHASH_AB $label n=$n nBits=$nBits pairs=$pairs " +
        f"candidates=$mass $wall%.2f s")
    }
    timed("wide", 256)
    // at n ≥ 10⁶ the narrow mass is ~10¹⁰ candidates (the measured
    // quadratic) — skip it unless asked
    if (!args.contains("wideonly")) timed("narrow", 64)
    spark.stop()
  }
}
