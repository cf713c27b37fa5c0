package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the containment-strategy A/B on a synthetic ZIPFIAN
  * corpus — the regime the sf0.1 fixture (disjoint replicated vocab,
  * bound/postings = 4.9) never reaches. Generates `tails` hot 6-token
  * tails each shared by `docsPerTail` documents (df per tail shingle =
  * docsPerTail, under the cap), times the forced inverted and forced
  * prefix branches, and prints the election inputs — the measured
  * evidence behind [[graft.operators.Dedup.PrefixBreakEvenRatio]].
  *
  * `runMain graft.ZipfAb [docsPerTail] [tails]` (defaults 150 × 100).
  */
object ZipfAb {
  def main(args: Array[String]): Unit = {
    val docsPerTail = args.headOption.map(_.toInt).getOrElse(150)
    val tails = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = (0 until tails).flatMap { t =>
      (0 until docsPerTail).map { i =>
        val id = t.toLong * docsPerTail + i
        (id, s"h${id}a h${id}b h${id}c h${id}d h${id}e h${id}f h${id}g " +
          s"h${id}h tail$t one$t two$t three$t four$t five$t")
      }
    }.toDF("doc_id", "text").localCheckpoint()

    val elected = operators.Dedup.electPrefix(docs, 10000)
    println(s"ZIPF_AB docs=${docs.count()} elected_prefix=$elected")

    def timed(label: String, force: Boolean): Unit = {
      val t0 = System.nanoTime()
      val n = operators.Dedup
        .containmentPairsImpl(docs, 0.8, 10000, forcePrefix = Some(force))
        .count()
      println(f"ZIPF_AB $label pairs=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm both branches once, then time
    timed("warm_inverted", force = false)
    timed("warm_prefix", force = true)
    timed("inverted", force = false)
    timed("prefix", force = true)
    spark.stop()
  }
}
