package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8: robust/approximate statistics for 100 TB profiling.
  *
  * q123 — MERGEABLE quantile sketch in the fixed-bin histogram family:
  * a (min, max, bin-counts) triple is re-aggregatable by construction
  * (counts add; ranges union), so partial sketches combine map-side and
  * across batches/slices exactly like the q90 HLL registers — the
  * "quantiles over a sharded corpus without a global sort" pass.
  * Estimates interpolate inside the winning bin; the error bound is one
  * bin width, asserted against exact order statistics in
  * RobustStatsSpec. Every count is an exact integer and the bin rule /
  * interpolation are the same double expression tree on both engines,
  * so the sketch itself is DuckDB-replayable — the oracle re-derives
  * identical estimates, not just similar ones.
  *
  * q124 — winsorization by ORDER STATISTICS: cap at the rank-⌈0.05n⌉ /
  * rank-⌈0.95n⌉ elements (type-1 quantiles, actual data values) rather
  * than interpolated percentiles — interpolation arithmetic differs in
  * the last ulp across engines, selected elements cannot. Ties in x
  * are harmless: any row at the boundary rank carries the same x. */
object RobustStats {

  private val B = 256

  // ------------------------------------------------------------- q123
  /** Q123: histogram-sketch quantiles (p50/p90/p99) of l_extendedprice
    * per return flag. Two group-keyed passes (range, then counts) and a
    * bins-sized frame thereafter. */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.t(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    val rng = base.groupBy(col("g"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
        count(lit(1)).as("n"))
    val binned = base.join(broadcast(rng), Seq("g"))
      .withColumn("w", (col("hi") - col("lo")) / lit(B.toDouble))
      .withColumn("bin",
        least(floor((col("x") - col("lo")) / col("w")).cast("int"), lit(B - 1)))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy(col("g")).orderBy(col("bin").asc_nulls_last)
    val cum = binned
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("cum_before", col("cum") - col("cnt"))
      .join(broadcast(rng), Seq("g"))
      .withColumn("w", (col("hi") - col("lo")) / lit(B.toDouble))
    val qs = cum.select(col("g"), col("bin"), col("cnt"), col("cum"),
        col("cum_before"), col("lo"), col("w"), col("n"))
      .crossJoin(broadcast(s.range(1).select(
        explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))))
      .withColumn("t", ceil(col("q") * col("n")).cast("long"))
      .where(col("cum") >= col("t"))
    val pick = Window.partitionBy(col("g"), col("q"))
      .orderBy(col("bin").asc_nulls_last)
    qs.withColumn("rk", row_number().over(pick)).where(col("rk") === 1)
      .select(col("g"), col("q"),
        round(col("lo") + col("w") * (col("bin") +
          (col("t") - col("cum_before")).cast("double") / col("cnt")), 6)
          .as("q_est"))
      .orderBy(col("g").asc_nulls_last, col("q").asc_nulls_last)
  }

  private val q123Sql =
    s"""WITH base AS (SELECT l_returnflag AS g, l_extendedprice AS x FROM lineitem),
       |rng AS (SELECT g, MIN(x) AS lo, MAX(x) AS hi, COUNT(*) AS n
       |  FROM base GROUP BY g),
       |binned AS (
       |  SELECT b.g,
       |    LEAST(CAST(FLOOR((x - lo) / ((hi - lo) / ${B}.0)) AS INTEGER), ${B - 1}) AS bin,
       |    COUNT(*) AS cnt
       |  FROM base b JOIN rng USING (g) GROUP BY 1, 2),
       |cum AS (
       |  SELECT g, bin, cnt,
       |    SUM(cnt) OVER (PARTITION BY g ORDER BY bin ASC) AS cum,
       |    SUM(cnt) OVER (PARTITION BY g ORDER BY bin ASC) - cnt AS cum_before
       |  FROM binned),
       |qset AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
       |hit AS (
       |  SELECT c.g, q.q, c.bin, c.cnt, c.cum_before,
       |    rng.lo, (rng.hi - rng.lo) / ${B}.0 AS w,
       |    CAST(CEIL(q.q * rng.n) AS BIGINT) AS t,
       |    ROW_NUMBER() OVER (PARTITION BY c.g, q.q ORDER BY c.bin ASC) AS rk
       |  FROM cum c JOIN rng USING (g) CROSS JOIN qset q
       |  WHERE c.cum >= CAST(CEIL(q.q * rng.n) AS BIGINT))
       |SELECT g, q,
       |  ROUND(lo + w * (bin + CAST(t - cum_before AS DOUBLE) / cnt), 6) AS q_est
       |FROM hit WHERE rk = 1
       |ORDER BY g ASC NULLS LAST, q ASC NULLS LAST""".stripMargin

  // ------------------------------------------------------------- q124
  /** Q124: winsorized aggregate of l_extendedprice per return flag —
    * cap at the rank-⌈0.05n⌉ / rank-⌈0.95n⌉ order statistics, report
    * the capped decimal sum and how many rows each tail clamped. */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.t(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
    val n = Window.partitionBy(col("g"))
    val ranked = base
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("x").asc_nulls_last)))
      .withColumn("n", count(lit(1)).over(n))
    val thresholds = ranked
      .where(col("rn") === greatest(lit(1L), ceil(col("n") * 0.05).cast("long")) ||
        col("rn") === ceil(col("n") * 0.95).cast("long"))
      .groupBy(col("g"))
      .agg(min(col("x")).as("p_lo"), max(col("x")).as("p_hi"))
    base.join(broadcast(thresholds), Seq("g"))
      .withColumn("capped",
        when(col("x") < col("p_lo"), col("p_lo"))
          .when(col("x") > col("p_hi"), col("p_hi"))
          .otherwise(col("x")))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("capped").cast("decimal(28,2)")).cast("double").as("wsum"),
        sum(when(col("x") < col("p_lo"), 1L).otherwise(0L)).cast("long").as("n_lo"),
        sum(when(col("x") > col("p_hi"), 1L).otherwise(0L)).cast("long").as("n_hi"))
      .orderBy(col("g").asc_nulls_last)
  }

  private val q124Sql =
    """WITH base AS (SELECT l_returnflag AS g, l_extendedprice AS x FROM lineitem),
      |ranked AS (
      |  SELECT g, x,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY x ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY g) AS n
      |  FROM base),
      |thresholds AS (
      |  SELECT g, MIN(x) AS p_lo, MAX(x) AS p_hi
      |  FROM ranked
      |  WHERE rn = GREATEST(1, CAST(CEIL(n * 0.05) AS BIGINT))
      |     OR rn = CAST(CEIL(n * 0.95) AS BIGINT)
      |  GROUP BY g)
      |SELECT b.g, COUNT(*) AS n,
      |  CAST(SUM(CAST(CASE WHEN x < p_lo THEN p_lo
      |                     WHEN x > p_hi THEN p_hi
      |                     ELSE x END AS DECIMAL(28,2))) AS DOUBLE) AS wsum,
      |  CAST(SUM(CASE WHEN x < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |  CAST(SUM(CASE WHEN x > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
      |FROM base b JOIN thresholds USING (g)
      |GROUP BY b.g
      |ORDER BY g ASC NULLS LAST""".stripMargin

  // ------------------------------------------------------------- q126
  /** Q126: quantile (rank) transform — sklearn's QuantileTransformer as
    * a window pass: x → percent_rank(x), which maps any distribution to
    * uniform[0,1]. The entry verifies the DEFINING property instead of
    * dumping 600k transformed rows: bucketing the transformed values
    * into deciles per group must give ~10% occupancy each — the decile
    * histogram is the output. percent_rank is RANK-based, so ties in x
    * share a value and both engines bucket identically. */
  private def q126(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("x").asc_nulls_last)
    Tables.t(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("decile",
        least(floor(col("pr") * 10).cast("int"), lit(9)))
      .groupBy(col("g"), col("decile"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("g").asc_nulls_last, col("decile").asc_nulls_last)
  }

  private val q126Sql =
    """SELECT g, LEAST(CAST(FLOOR(pr * 10) AS INTEGER), 9) AS decile,
      |  COUNT(*) AS n
      |FROM (
      |  SELECT l_returnflag AS g,
      |    PERCENT_RANK() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice ASC) AS pr
      |  FROM lineitem)
      |GROUP BY 1, 2
      |ORDER BY g ASC NULLS LAST, decile ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q123_hist_quantiles", q123, Some(q123Sql)),
    QueryDef("q124_winsorize", q124, Some(q124Sql)),
    QueryDef("q126_quantile_transform", q126, Some(q126Sql)))
}
