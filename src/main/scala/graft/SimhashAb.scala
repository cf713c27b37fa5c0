package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the simhash blocking-tier A/B behind the
  * [[operators.Dedup.electSimhashBlockingByMass]] boundary. For each
  * tier it measures, from the hashes alone (no pair run needed):
  *
  *  - band rows shuffled = probes · n (tier 3's linear cost term), and
  *  - candidate mass = Σ C(bucket, 2) over (probe, key) buckets (the
  *    quadratic verify-stream term that saturating keys inflate),
  *
  * which together place the tier crossover with DATA where wall-clock
  * runs are hours-class: tier 2 wall ≈ hash + mass·c_verify, tier 3
  * wall ≈ hash + rows·c_shuffle, with the constants calibratable from
  * the measured sf10 walls (r14k/l: 83.2 s tier 2, 337.9 s tier 3 at
  * 5·10⁵ docs). Optionally times the full pair run per tier when
  * `wall` is passed.
  *
  * `runMain graft.SimhashAb [wall]` over SPARK_GRAFT_SF_DIR.
  */
object SimhashAb {
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
    val docs = Tables.t(spark, sfDir, "documents")
    val n = docs.count()
    // "sample3=K": measure tier 3's mass on K probes spread evenly
    // across its 495 combos instead of all of them — Σ C(bucket,2) is
    // additive over probes, so the per-probe masses ARE exact and the
    // total is a sampled measurement with printed spread (needed past
    // ~5·10⁶ docs, where the full 495·n histogram outgrows local disk;
    // the r15 tier-3 horizon point at 10⁷ docs uses sample3=33)
    val sample3: Int = args.collectFirst {
      case a if a.startsWith("sample3=") => a.drop(8).toInt
    }.getOrElse(0)
    val sims = operators.Dedup.simhash(docs, 60).localCheckpoint()
    for ((label, nBands, bandBits, keyBlocks) <-
        Seq(("tier1", 10, 6, 1), ("tier2", 10, 6, 2), ("tier3", 12, 5, 4))) {
      def bandVal(b: Int): String = {
        val off = b * bandBits
        s"((sh0 div ${1L << (off % 60)}) % ${1L << bandBits})"
      }
      val all = (0 until nBands).combinations(keyBlocks).map(_.toSeq).toSeq
      val combos =
        if (label == "tier3" && sample3 > 0 && sample3 < all.size) {
          val step = math.max(1, all.size / sample3)
          all.zipWithIndex.collect { case (c, i) if i % step == 0 => c }
        } else all
      val keys = sims
        .withColumn("arr", array((0 until nBands).map(b =>
          expr(bandVal(b))): _*))
        .select(posexplode(typedlit(combos)).as(Seq("band", "blocks")),
          col("arr"))
        .select(col("band"),
          expr(s"aggregate(blocks, 0L, (acc, b) -> " +
            s"acc * ${1L << bandBits} + element_at(arr, b + 1))").as("bk"))
      val perProbe = keys.groupBy("band", "bk").count()
        .groupBy("band")
        .agg(sum(expr("count * (count - 1) / 2")).cast("long").as("m"))
        .collect().map(_.getLong(1))
      val mass = perProbe.sum
      if (combos.size < all.size) {
        val scaled = mass.toDouble * all.size / combos.size
        println(f"SIMHASH_AB $label SAMPLED probes=${combos.size}/${all.size} " +
          f"massSampled=$mass scaled=$scaled%.3e " +
          f"perProbe[min/med/max]=${perProbe.min}/" +
          f"${perProbe.sorted.apply(perProbe.length / 2)}/${perProbe.max}")
      }
      val rows = combos.size.toLong * n
      val wall = if (args.contains("wall")) {
        val t0 = System.nanoTime()
        operators.Dedup.simhashPairs(docs, nBands = nBands,
          bandBits = bandBits, keyBlocks = keyBlocks)
          .write.format("noop").mode("overwrite").save()
        f"${(System.nanoTime() - t0) / 1e9}%.1f"
      } else "-"
      // ADVICE r15: on a sampled run the standard machine-parsed line
      // must not present the partial mass in the full-run field — the
      // field is renamed (candidates_sampled=) and the SCALED estimate
      // rides in the main line, so ledger transcription cannot mistake
      // a 33-probe subset mass for the tier's full mass. The every-step
      // combo subset is deterministic; if specific leading bands are
      // crowded it can bias the estimate — the per-probe min/med/max
      // spread printed above is the check (±3% at the r15j horizon).
      if (combos.size < all.size) {
        val scaled = mass.toDouble * all.size / combos.size
        println(f"SIMHASH_AB $label n=$n probes=${combos.size}/${all.size} " +
          f"bandRows=$rows candidates_sampled=$mass " +
          f"candidates_scaled=$scaled%.4e wall=$wall s")
      } else
        println(s"SIMHASH_AB $label n=$n probes=${combos.size} " +
          s"bandRows=$rows candidates=$mass wall=$wall s")
    }
    // what the production election would do here: the in-engine
    // pre-pass (measured m1/m2, modeled m3) against this harness's
    // EXACT per-tier masses above — divergence between the two is the
    // Tier3MassRatio model error, ledgered per decade
    val (n2, m1, m2, mDup) = operators.Dedup.measureSimhashMasses(sims)
    val pick = operators.Dedup.electSimhashBlockingByMass(n2, m1, m2, mDup)
    println(s"SIMHASH_ELECT n=$n2 m1=$m1 m2=$m2 " +
      s"m3_model=${operators.Dedup.Tier3MassRatio * m2} m_dup=$mDup elected=$pick")
    spark.stop()
  }
}
