package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9: sliding-window distinct counting — DAU + exact 7-day
  * rolling distinct users per event type (the WAU/DAU board every
  * product pipeline computes). COUNT(DISTINCT) over a sliding window
  * is not re-aggregatable from daily distincts (users repeat across
  * days), which is why naive plans re-scan the window per day.
  *
  * Spark-first shape: dedup to the (type, day, user) grain ONCE (one
  * keyed exchange at the data's natural density), then EXPLODE each
  * triple into the ≤7 window-end days it serves and dedup to (type,
  * window, user) — turning "distinct over ranges" into two plain
  * hash aggregations with a bounded ×7 blowup, both keyed wide enough
  * to never depend on |types| for parallelism. The q90 HLL profile is
  * this query's sketch sibling (re-aggregatable approximate state);
  * this is the exact path, affordable because the explode factor is
  * the window length, not the corpus.
  *
  * Determinism/oracle: pure integer set algebra on dates — DuckDB
  * replays it with the same explode (range 0..6) + distinct. Output
  * only for (type, day) with activity that day (join against the
  * daily grain), ordered by (type, day). */
object SlidingDistinct {

  private val WindowDays = 7

  /** PUBLIC API — (g, day, dau, wau) over (g, day, user) rows, where
    * `wau` is the exact distinct-user count in [day−days+1, day]. */
  def slidingDistinct(events: DataFrame, days: Int = WindowDays): DataFrame = {
    val triples = events.select(col("g"), col("day"), col("user")).distinct()
    val daily = triples.groupBy(col("g"), col("day"))
      .agg(count(lit(1)).as("dau"))
    val rolled = triples
      .select(col("g"), col("user"),
        explode(sequence(col("day"), date_add(col("day"), days - 1))).as("day"))
      .distinct()
      .groupBy(col("g"), col("day"))
      .agg(count(lit(1)).as("wau"))
    daily.join(rolled, Seq("g", "day"))
      .select(col("g"), col("day"), col("dau"), col("wau"))
      .orderBy(col("g").asc_nulls_last, col("day").asc_nulls_last)
  }

  /** Q149: DAU/WAU-7 per event type over `events`. */
  private def q149(s: SparkSession, dir: String): DataFrame =
    slidingDistinct(Tables.t(s, dir, "events").select(
      col("event_type").as("g"), to_date(col("ts")).as("day"),
      col("user_id").as("user")))

  private val q149Sql =
    s"""WITH t AS (
       |  SELECT DISTINCT event_type AS g, CAST(ts AS DATE) AS day, user_id AS u
       |  FROM events),
       |daily AS (SELECT g, day, COUNT(*) AS dau FROM t GROUP BY g, day),
       |spread AS (
       |  SELECT DISTINCT g, u, day + CAST(i.i AS INTEGER) AS day
       |  FROM t CROSS JOIN range(0, $WindowDays) i(i)),
       |rolled AS (SELECT g, day, COUNT(*) AS wau FROM spread GROUP BY g, day)
       |SELECT d.g, d.day, d.dau, r.wau
       |FROM daily d JOIN rolled r ON d.g = r.g AND d.day = r.day
       |ORDER BY d.g ASC NULLS LAST, d.day ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q149_sliding_distinct", q149, Some(q149Sql)))
}
