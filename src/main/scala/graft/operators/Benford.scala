package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12: Benford first-digit audit — the fabricated-data detector.
  * Naturally-grown multiplicative quantities (prices, populations,
  * file sizes) have first digits distributed as P(d) = log10(1 + 1/d)
  * (Newcomb 1881, Benford 1938); synthetic, capped, or hand-entered
  * data does not. The audit reports, per group, the observed
  * first-digit distribution's total-variation distance from Benford
  * plus the worst digit — the forensic screen an ingest pipeline runs
  * on any new numeric source (and the honest answer here: TPC-H's
  * uniform generators are NOT Benford, which the fixture rows show).
  *
  * Oracle parity: the nine Benford probabilities are TRANSCENDENTAL
  * but CONSTANT — they enter both engines as the same 12-dp literals,
  * so no log10() is ever evaluated at query time. The first digit is
  * extracted from the BIGINT floor via string head (bigint-to-string
  * is locale-free and identical in both engines; doubles are floored
  * first, values < 1 are excluded by contract since their leading
  * digit depends on magnitude normalization). TVD folds ≤9 terms of
  * |obs/n − const| — each rounded to 12 dp into an exact
  * DECIMAL(38,12) sum, the established order-free discipline.
  *
  * Scale: one map-combined (group, digit) count — ≤9 rows per group
  * downstream, the q154 categorical-drift shape.
  *
  * Reference anchor: celeborn checksums shuffle payloads for
  * CORRUPTION (worker/.../PartitionDataWriter CRCs); Benford screens
  * for FABRICATION — the data-plane integrity check no checksum sees.
  */
object Benford {

  private val BenfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.301029995664, 2 -> 0.176091259056, 3 -> 0.124938736608,
    4 -> 0.096910013008, 5 -> 0.079181246048, 6 -> 0.066946789631,
    7 -> 0.057991946978, 8 -> 0.051152522447, 9 -> 0.045757490561)

  /** PUBLIC API — Benford audit of rows (g, x: double), x >= 1 kept:
    * per group, n, TVD from Benford, the digit with the largest
    * absolute deviation (ties to the lower digit), and its signed
    * excess (observed − expected). */
  def firstDigitAudit(rows: DataFrame): DataFrame = {
    val sp = rows.sparkSession
    import sp.implicits._
    // FLOOR before the bigint cast: Spark's double->bigint truncates
    // but DuckDB's ROUNDS (1999.99 would flip digit 1 -> 2); flooring
    // first makes both engines truncate identically
    val digit = substring(floor(col("x")).cast("bigint").cast("string"), 1, 1)
      .cast("int")
    // tiny (<=9 rows/group) but fact-derived, and consumed three times
    // (grid, dense, n) — checkpoint once
    val counts = rows.where(col("x") >= 1)
      .select(col("g"), digit.as("d"))
      .groupBy(col("g"), col("d")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // dense 9-digit grid per group: absent digits carry their full
    // Benford mass into the TVD, so they must exist as zero rows
    val grid = counts.select(col("g")).distinct()
      .crossJoin(broadcast(BenfordP.toDF("d", "p")))
    val dense = grid.join(counts, Seq("g", "d"), "left")
      .select(col("g"), col("d"), col("p"),
        coalesce(col("c"), lit(0L)).as("c"))
    val n = counts.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val dev = dense.join(n, "g")
      .select(col("g"), col("d"), col("n"),
        (col("c").cast("double") / col("n") - col("p")).as("dev"))
    val agg = dev.groupBy(col("g"), col("n")).agg(
      sum(round(abs(col("dev")) / 2, 12).cast("decimal(38,12)"))
        .as("tvd_d"))
    // worst digit by rank (|dev| desc, low digit on ties) — DuckDB's
    // MAX_BY has no composite ordering, so both engines rank
    val wWorst = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"))
      .orderBy(abs(col("dev")).desc, col("d").asc)
    val worst = dev
      .withColumn("rk", row_number().over(wWorst))
      .where(col("rk") === 1)
      .select(col("g"), col("d").as("worst_digit"),
        round(col("dev"), 9).as("worst_excess"))
    agg.join(worst, "g")
      .select(col("g"), col("n"),
        round(col("tvd_d").cast("double"), 9).as("benford_tvd"),
        col("worst_digit"), col("worst_excess"))
      .orderBy(col("g").asc_nulls_last)
  }

  /** Q177: Benford screen of order totals per priority class — and the
    * honest fixture finding: TPC-H uniform generators are not Benford. */
  private def q177(s: SparkSession, dir: String): DataFrame =
    firstDigitAudit(Tables.t(s, dir, "orders")
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("x")))

  private val q177Sql: String = {
    val pVals = BenfordP.map { case (d, p) => s"($d, $p)" }.mkString(", ")
    s"""WITH bp(d, p) AS (VALUES $pVals),
       |counts AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
       |      AS VARCHAR), 1, 1) AS INTEGER) AS d,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM orders WHERE o_totalprice >= 1
       |  GROUP BY 1, 2),
       |grid AS (
       |  SELECT g, d, p FROM (SELECT DISTINCT g FROM counts)
       |  CROSS JOIN bp),
       |dense AS (
       |  SELECT grid.g, grid.d, grid.p, COALESCE(counts.c, 0) AS c
       |  FROM grid LEFT JOIN counts
       |    ON grid.g = counts.g AND grid.d = counts.d),
       |n AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY g),
       |dev AS (
       |  SELECT dense.g, dense.d, n.n,
       |    CAST(dense.c AS DOUBLE) / n.n - dense.p AS dev
       |  FROM dense JOIN n ON dense.g = n.g),
       |agg AS (
       |  SELECT g, n,
       |    ROUND(CAST(SUM(CAST(ROUND(ABS(dev) / 2, 12) AS DECIMAL(38,12)))
       |      AS DOUBLE), 9) AS benford_tvd
       |  FROM dev GROUP BY g, n),
       |worst AS (
       |  SELECT g, CAST(d AS INTEGER) AS worst_digit,
       |    ROUND(dev, 9) AS worst_excess
       |  FROM (SELECT g, d, dev, ROW_NUMBER() OVER (
       |      PARTITION BY g ORDER BY ABS(dev) DESC, d ASC) AS rk
       |    FROM dev) WHERE rk = 1)
       |SELECT agg.g, agg.n, agg.benford_tvd,
       |  worst.worst_digit, worst.worst_excess
       |FROM agg JOIN worst ON agg.g = worst.g
       |ORDER BY agg.g ASC NULLS LAST""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q177_benford", q177, Some(q177Sql)))
}
