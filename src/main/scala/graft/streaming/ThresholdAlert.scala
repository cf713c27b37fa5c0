package graft.streaming

import java.sql.Timestamp

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary-state streaming v2 (`transformWithState`, SPARK-46815 —
  * Spark 4's successor to `flatMapGroupsWithState`): per-user cumulative
  * spend monitoring that emits ONE alert the first time a user's running
  * total crosses a threshold. Complements the q25 sessionizer
  * ([[SessionState]], the v1 `flatMapGroupsWithState` API) with the new
  * `StatefulProcessor` + typed `ValueState` surface, which a real
  * pipeline needs for long-lived per-entity accumulators (quota
  * enforcement, budget caps, fraud thresholds) where window/session
  * aggregations don't fit: state here lives for the entity's lifetime,
  * not a time horizon, and the emission is edge-triggered.
  *
  * Determinism discipline: the running sum is EXACT decimal arithmetic
  * (scale 6) in all three implementations — the streaming processor
  * (java BigDecimal), the batch twin (Spark DECIMAL window sum), and
  * the DuckDB oracle — because a cumulative DOUBLE would tie the result
  * to each engine's window-aggregation fold order (Spark accumulates
  * sequentially; DuckDB uses a segment tree — different rounding).
  * Events fold in (ts, event_id) order; the processor sorts each
  * micro-batch's rows per key, so any in-order batching of the log
  * yields the batch twin's exact alerts (proven in StreamingSpec).
  *
  * Scale: state is ~25 bytes per user in RocksDB (the v2 API's required
  * state store), alerts are edge-triggered (once per user ever), and
  * the batch twin is one window pass — no self-join, no collect.
  */
object ThresholdAlert {

  private val DefaultThreshold = 3000.0

  case class SpendEvent(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  case class AlertRow(user_id: Long, crossed_ts: Timestamp,
      crossed_event_id: Long, cum_value: Double, n_events: Long)
  case class SpendAcc(cum: java.math.BigDecimal, n: Long, alerted: Boolean)

  /** The v2 stateful processor: ValueState accumulator, edge-triggered
    * emission. Rows are folded in (ts, event_id) order within each
    * micro-batch. */
  class ThresholdProcessor(threshold: Double)
      extends StatefulProcessor[Long, SpendEvent, AlertRow] {
    @transient private var st: ValueState[SpendAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SpendAcc](
        "acc", Encoders.product[SpendAcc], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SpendEvent],
        tv: TimerValues): Iterator[AlertRow] = {
      var acc = Option(st.get())
        .getOrElse(SpendAcc(java.math.BigDecimal.ZERO.setScale(6), 0L, false))
      val out = scala.collection.mutable.ArrayBuffer.empty[AlertRow]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val cum = acc.cum.add(
          new java.math.BigDecimal(e.value).setScale(6, java.math.RoundingMode.HALF_UP))
        val n = acc.n + 1
        val fire = !acc.alerted && cum.doubleValue > threshold
        if (fire) out += AlertRow(key, e.ts, e.event_id, cum.doubleValue, n)
        acc = SpendAcc(cum, n, acc.alerted || fire)
      }
      st.update(acc)
      out.iterator
    }
  }

  /** PUBLIC API — the streaming path: typed transformWithState over a
    * keyed event stream. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), the v2 API's
    * backing store. */
  def alerts(events: Dataset[SpendEvent],
      threshold: Double = DefaultThreshold): Dataset[AlertRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ThresholdProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
  }

  /** q93: the batch twin — first threshold crossing per user over the
    * whole events log, exact-decimal running sum. */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val ord = Seq(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    val w = Window.partitionBy(col("user_id")).orderBy(ord: _*)
    Tables.t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("cum_value",
        sum(col("value").cast("decimal(20,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("n_events", row_number().over(w))
      .where(col("cum_value") > DefaultThreshold)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("ts").as("crossed_ts"),
        col("event_id").as("crossed_event_id"), col("cum_value"),
        col("n_events").cast("long").as("n_events"))
      .orderBy(col("user_id").asc_nulls_last)
  }

  private val q93Sql =
    s"""WITH c AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER (
       |      PARTITION BY user_id
       |      ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS n_events
       |  FROM events),
       |x AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |    ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS rn
       |  FROM c WHERE cum_value > $DefaultThreshold)
       |SELECT user_id, ts AS crossed_ts, event_id AS crossed_event_id,
       |  cum_value, n_events
       |FROM x WHERE rn = 1
       |ORDER BY user_id ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q93_threshold_alerts", q93, Some(q93Sql)))
}
