package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12: weekly seasonality profile — per group, the day-of-week
  * means of the daily series plus the seasonality STRENGTH
  * η² = SS_between / SS_total (the variance share the weekly cycle
  * explains, 0..1). q167's ACF detects periodicity as a lag-7 echo;
  * this DECOMPOSES it: which weekdays carry the traffic, and how much
  * of the series' variance the weekly cycle accounts for — the
  * capacity-planning and anomaly-baseline question ("is Sunday always
  * 40% down, or was that a drop?").
  *
  * Engine-independent day-of-week: dow = (epoch-day index) mod 7 —
  * pure integer arithmetic shared with the DuckDB oracle, so no
  * locale/ISO dayofweek() convention can diverge (0 = the epoch
  * anchor's weekday, consistent across both engines by construction).
  * Spark's pmod is always non-negative; DuckDB's % keeps the
  * dividend's sign, so the SQL mirror uses ((dd % 7) + 7) % 7 to stay
  * identical for days BEFORE the 1995-01-01 anchor (r12 ADVICE).
  *
  * Oracle parity: all inputs are BIGINT sums (n_d, s_d, Σx²); the
  * variance decomposition SS_b = Σ_d s_d²/n_d − S²/N and
  * SS_t = Σx² − S²/N need per-dow double terms summed — ≤7 of them,
  * each rounded to 12 dp and folded through an exact DECIMAL(38,12)
  * SUM (the established order-free discipline), then one division.
  * Constant series (SS_t = 0) emit NULL strength, the q164 degenerate
  * contract. Output grain is (g, dow) with the group-level strength
  * repeated per row (the q165 repeated-statistic shape).
  *
  * Scale: one fact-sized map-combined daily count; everything after
  * runs on the ≤7·groups (g, dow) frame.
  *
  * Reference anchor: celeborn's load-aware slot placement
  * (master/.../SlotsAllocator) reacts to instantaneous load; weekly
  * decomposition is what turns that reactive signal into a schedule.
  */
object Seasonality {

  /** PUBLIC API — weekly profile over a (g, day, x: long) daily
    * series: per (g, dow) the day count, total and mean, plus the
    * group-level η² seasonality strength and overall mean. */
  def weeklyProfile(daily: DataFrame): DataFrame = {
    val dd = datediff(col("day"), lit(java.sql.Date.valueOf("1995-01-01")))
      .cast("long")
    val byDow = daily
      .select(col("g"), pmod(dd, lit(7L)).as("dow"), col("x"))
      .groupBy(col("g"), col("dow"))
      .agg(count(lit(1)).as("n_d"), sum(col("x")).as("s_d"),
        sum(col("x") * col("x")).as("ss_d"))
      .localCheckpoint()
    val grp = byDow.groupBy(col("g")).agg(
      sum(col("n_d")).as("n_days"), sum(col("s_d")).as("s_tot"),
      sum(col("ss_d")).as("ss_tot"),
      // ≤7 double terms, each rounded to 12 dp, folded through an
      // exact decimal sum: order-free in both engines
      // s_d is cast double BEFORE squaring: a long*long square
      // overflows silently at large masses, and the DuckDB mirror
      // multiplies in double — same expression, same rounding
      sum(round(col("s_d").cast("double") * col("s_d") / col("n_d"), 12)
        .cast("decimal(38,12)")).as("sb_num"))
    val stats = grp.select(col("g"), col("n_days"),
      (col("s_tot").cast("double") / col("n_days")).as("mean_all"),
      (col("sb_num").cast("double") -
        col("s_tot").cast("double") * col("s_tot") / col("n_days"))
        .as("ss_b"),
      (col("ss_tot").cast("double") -
        col("s_tot").cast("double") * col("s_tot") / col("n_days"))
        .as("ss_t"))
    byDow.join(stats, "g")
      .select(col("g"), col("dow"), col("n_d"),
        round(col("s_d").cast("double") / col("n_d"), 6).as("mean_dow"),
        round(col("mean_all"), 6).as("mean_all"),
        when(col("ss_t") > 0, round(col("ss_b") / col("ss_t"), 9))
          .as("strength"))
      .orderBy(col("g").asc_nulls_last, col("dow").asc_nulls_last)
  }

  /** Q173: weekly seasonality of each event type's daily volume. */
  private def q173(s: SparkSession, dir: String): DataFrame =
    weeklyProfile(Tables.t(s, dir, "events")
      .groupBy(col("event_type").as("g"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))

  private val q173Sql: String =
    """WITH daily AS (
      |  SELECT event_type AS g, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |bydow AS (
      |  SELECT g,
      |    CAST(((date_diff('day', DATE '1995-01-01', day) % 7) + 7) % 7
      |      AS BIGINT) AS dow,
      |    CAST(COUNT(*) AS BIGINT) AS n_d,
      |    CAST(SUM(x) AS BIGINT) AS s_d,
      |    CAST(SUM(x * x) AS BIGINT) AS ss_d
      |  FROM daily GROUP BY 1, 2),
      |grp AS (
      |  SELECT g, CAST(SUM(n_d) AS BIGINT) AS n_days,
      |    CAST(SUM(s_d) AS BIGINT) AS s_tot,
      |    CAST(SUM(ss_d) AS BIGINT) AS ss_tot,
      |    SUM(CAST(ROUND(CAST(s_d AS DOUBLE) * s_d / n_d, 12)
      |      AS DECIMAL(38,12))) AS sb_num
      |  FROM bydow GROUP BY g),
      |stats AS (
      |  SELECT g, n_days,
      |    CAST(s_tot AS DOUBLE) / n_days AS mean_all,
      |    CAST(sb_num AS DOUBLE)
      |      - CAST(s_tot AS DOUBLE) * s_tot / n_days AS ss_b,
      |    CAST(ss_tot AS DOUBLE)
      |      - CAST(s_tot AS DOUBLE) * s_tot / n_days AS ss_t
      |  FROM grp)
      |SELECT b.g, b.dow, b.n_d,
      |  ROUND(CAST(b.s_d AS DOUBLE) / b.n_d, 6) AS mean_dow,
      |  ROUND(s.mean_all, 6) AS mean_all,
      |  CASE WHEN s.ss_t > 0 THEN ROUND(s.ss_b / s.ss_t, 9) END AS strength
      |FROM bydow b JOIN stats s USING (g)
      |ORDER BY b.g ASC NULLS LAST, b.dow ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q173_seasonality", q173, Some(q173Sql)))
}
