package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8: three reporting operators.
  *
  * q141 — time-weighted average (TWAP): on an IRREGULAR series the
  * arithmetic mean over-weights bursts; the honest average holds each
  * observation for its lifetime (until the next event). One per-key
  * lead window derives the holding duration; the weighted fold is a
  * decimal sum of value×seconds — integer microsecond durations, so
  * the weights are exact.
  *
  * q142 — k-anonymity audit: equivalence classes of the
  * quasi-identifier tuple smaller than k re-identify their members
  * (Sweeney 2002). The audit is one keyed count + a histogram of
  * class sizes — the privacy counterpart of q70's PII redaction
  * (redaction removes direct identifiers; this measures the indirect
  * ones).
  *
  * q143 — period-over-period report: monthly revenue per nation with
  * MoM delta via one lag window over the (nation, month) aggregate —
  * the standard BI growth table; the window runs on the AGGREGATED
  * frame (|nations|×|months| rows), never the facts. */
object Twap {

  /** PUBLIC API — per-key lead(ts) with UNBOUNDED parallelism: the naive
    * `lead over (partition by key)` caps parallelism at |keys| (5 event
    * types here — the r8 sf1 study measured 3.6× at 10× data on exactly
    * that plan). This computes the same column over composite
    * (key, day) partitions — day-sized sorts, |keys|×|days| concurrent
    * tasks — and stitches the day boundaries with one tiny per-day
    * window: each day's LAST event takes the next non-empty day's first
    * ts for its key (per-(key,day) firsts are |keys|×|days| rows, so the
    * stitch window is a kilobyte-scale frame, never the facts).
    * Equality to the single-window answer: within a day the two leads
    * coincide; the one row per (key, day) with no within-day successor
    * is exactly the row whose global successor opens the next non-empty
    * day. Proven in ReportingSpec AND by the driver: q141's oracle stays
    * the single-window SQL definition, so the hash compare itself is the
    * equality proof at every sf. */
  def leadTsStitched(events: DataFrame, key: String): DataFrame = {
    val day = to_date(col("ts"))
    val wDay = Window.partitionBy(col(key), col("_day"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    val wStitch = Window.partitionBy(col(key))
      .orderBy(col("_day").asc_nulls_last)
    val firsts = events
      .groupBy(col(key), day.as("_day"))
      .agg(min(struct(col("ts"), col("event_id"))).getField("ts").as("_first_ts"))
      .withColumn("_next_first_ts", lead(col("_first_ts"), 1).over(wStitch))
      .select(col(key), col("_day"), col("_next_first_ts"))
    events.withColumn("_day", day)
      .withColumn("_lead_in_day", lead(col("ts"), 1).over(wDay))
      .join(broadcast(firsts), Seq(key, "_day"))
      .withColumn("next_ts", coalesce(col("_lead_in_day"), col("_next_first_ts")))
      .drop("_day", "_lead_in_day", "_next_first_ts")
  }

  /** Q141: per-event-type TWAP of `value` vs the naive mean (scale-safe
    * composite-window plan; see [[leadTsStitched]]). */
  private def q141(s: SparkSession, dir: String): DataFrame =
    leadTsStitched(Tables.t(s, dir, "events"), "event_type")
      .where(col("next_ts").isNotNull)
      .withColumn("dur_us",
        (unix_micros(col("next_ts")) - unix_micros(col("ts"))))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_held"),
        round(sum((col("value") * col("dur_us")).cast("decimal(38,6)"))
          .cast("double") /
          sum(col("dur_us").cast("decimal(38,0)")).cast("double"), 9)
          .as("twap"),
        round(sum(col("value").cast("decimal(28,6)")).cast("double") /
          count(lit(1)), 9).as("naive_mean"))
      .orderBy(col("event_type").asc_nulls_last)

  private val q141Sql =
    """WITH held AS (
      |  SELECT event_type, value,
      |    CAST(epoch_us(LEAD(ts, 1) OVER (PARTITION BY event_type
      |      ORDER BY ts ASC, event_id ASC)) - epoch_us(ts) AS BIGINT) AS dur_us
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_held,
      |  ROUND(CAST(SUM(CAST(value * dur_us AS DECIMAL(38,6))) AS DOUBLE) /
      |    CAST(SUM(CAST(dur_us AS DECIMAL(38,0))) AS DOUBLE), 9) AS twap,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
      |    / COUNT(*), 9) AS naive_mean
      |FROM held WHERE dur_us IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type ASC NULLS LAST""".stripMargin

  /** Q142: k-anonymity histogram over the (nationkey, mktsegment)
    * quasi-identifier; classes below k=5 are the re-identification
    * exposure. */
  private def q142(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < 5, col("class_size")).otherwise(0L))
          .cast("long").as("exposed_rows"))
      .orderBy(col("class_size").asc_nulls_last)

  private val q142Sql =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
      |  FROM customer GROUP BY 1, 2)
      |SELECT class_size, COUNT(*) AS n_classes,
      |  CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
      |    AS BIGINT) AS exposed_rows
      |FROM classes
      |GROUP BY class_size
      |ORDER BY class_size ASC NULLS LAST""".stripMargin

  /** Q143: monthly revenue per nation with month-over-month delta. */
  private def q143(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.t(s, dir, "customer")
      .join(Tables.t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .where(year(col("o_orderdate")) === 1997)
      .groupBy(col("n_name").as("nation"),
        month(col("o_orderdate")).as("mo"))
      .agg(sum(col("o_totalprice").cast("decimal(28,2)"))
        .cast("double").as("revenue"))
    val w = Window.partitionBy(col("nation")).orderBy(col("mo").asc_nulls_last)
    monthly
      .withColumn("prev", lag(col("revenue"), 1).over(w))
      .select(col("nation"), col("mo"), round(col("revenue"), 2).as("revenue"),
        round(col("revenue") - coalesce(col("prev"), col("revenue")), 2)
          .as("mom_delta"))
      .orderBy(col("nation").asc_nulls_last, col("mo").asc_nulls_last)
  }

  private val q143Sql =
    """WITH monthly AS (
      |  SELECT n_name AS nation,
      |    CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
      |  FROM customer
      |    JOIN orders ON c_custkey = o_custkey
      |    JOIN nation ON c_nationkey = n_nationkey
      |  WHERE EXTRACT(year FROM o_orderdate) = 1997
      |  GROUP BY 1, 2)
      |SELECT nation, mo, ROUND(revenue, 2) AS revenue,
      |  ROUND(revenue - COALESCE(LAG(revenue, 1) OVER (PARTITION BY nation
      |    ORDER BY mo ASC), revenue), 2) AS mom_delta
      |FROM monthly
      |ORDER BY nation ASC NULLS LAST, mo ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q141_twap", q141, Some(q141Sql)),
    QueryDef("q142_k_anonymity", q142, Some(q142Sql)),
    QueryDef("q143_mom_growth", q143, Some(q143Sql)))
}
