package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the embedding-LSH parameter A/B behind the q28_dedup_embed
  * decade adjudication. The REGISTRY entry deliberately runs the wide-
  * bucket low-threshold variant (8 tables × 4 bits, threshold 0.45 —
  * recall ≈ 1, oracle-replayable, quadratic BY CONSTRUCTION: 16 buckets
  * per table is all-pairs/16 in disguise, as its scaladoc has always
  * said); production near-dup runs 12 × 12 (4096 buckets/table,
  * S-curve recall ≈ 0.98 at cos 0.95). This main times both at
  * SPARK_GRAFT_SF_DIR so the ledger can show the production
  * configuration's decade slope next to the registry variant's.
  *
  * `runMain graft.EmbedAb [wide]` — pass `wide` to also time the 8×4
  * registry variant (minutes at sf10); default times 12×12 only.
  */
object EmbedAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.t(spark, sfDir, "embeddings")
    def timed(label: String, tables: Int, bits: Int): Unit = {
      def once(): Long = operators.Dedup
        .embedCosinePairs(spark, e, threshold = 0.45,
          nTables = tables, bitsPerTable = bits)
        .count()
      once() // warm
      val t0 = System.nanoTime()
      val n = once()
      println(f"EMBED_AB $label tables=$tables bits=$bits pairs=$n " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("production", 12, 12)
    if (args.contains("wide")) timed("registry", 8, 4)
    spark.stop()
  }
}
