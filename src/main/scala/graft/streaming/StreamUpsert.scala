package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC upsert — the `foreachBatch` maintenance sink: a change
  * stream keyed by primary key with a monotone version column is merged
  * into a materialized latest-state table, micro-batch by micro-batch.
  * This is the lakehouse MERGE-INTO loop (Structured Streaming's
  * documented idiom for sinks with no native streaming writer), and the
  * one streaming sink surface the q36/q51/q75 family doesn't cover:
  * `writeStream.foreachBatch` handing each batch to a BATCH merge.
  *
  * Correctness discipline: the merge rule is max-version-wins per key
  * (ties broken by the highest event_id), which makes the final state
  *  - batch-boundary-invariant: any partition of the change log into
  *    micro-batches converges to the same table (asserted against the
  *    one-shot batch kernel in StreamingSpec), and
  *  - idempotent: re-applying a delivered batch is a no-op, which is
  *    exactly the property a foreachBatch sink needs because Spark's
  *    failure contract re-runs a batch id after a crash.
  *
  * Scale shape (100 TB of CDC log): the batch kernel [[latestState]] is
  * ONE combine-enabled hash aggregation (max over a version-ordered
  * struct) — map-side partial argmax, a single exchange keyed by the
  * primary key, no window sort of the full log. The per-batch merge
  * joins a micro-batch-sized delta against the base on the same key the
  * base is clustered on (q50/q66's bucketing lesson applies unchanged).
  * The reference's analogue: replayed pushes reconciled by the winning
  * attempt per batch (celeborn
  * client/src/main/java/org/apache/celeborn/client/read/CelebornInputStream.java:864-899).
  */
object StreamUpsert {

  /** PUBLIC API — latest-state materialization of a change log: one row
    * per `key`, the one with the greatest (`version`, event_id), plus
    * the change count. One aggregation, no window. */
  def latestState(changes: DataFrame, key: String, version: String): DataFrame = {
    val payload = changes.columns.filter(c => c != key).toSeq
    changes
      .groupBy(col(key))
      .agg(
        max(struct((col(version) +: payload.filterNot(_ == version).map(col)): _*))
          .as("best"),
        count(lit(1)).as("n_changes"))
      .select(col(key) +: payload.map(c => col(s"best.$c").as(c))
        :+ col("n_changes"): _*)
  }

  /** PUBLIC API — run the change stream through a foreachBatch merge
    * into `targetDir` (parquet). Each micro-batch folds its own latest
    * state, then merges max-version-wins into the current table. */
  def runMergeStream(s: SparkSession, changes: DataFrame, targetDir: String,
      key: String, version: String): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(s, batch, targetDir, key, version)
      }
      // sibling dir: the merge overwrites targetDir wholesale, which
      // must not take the stream's own checkpoint with it
      .option("checkpointLocation", s"${targetDir}_ckpt")
      .start()

  /** One merge step: latest state of the delta, max-version-wins against
    * the existing table. The state carries no run-dependent bookkeeping
    * (no change counters), so replaying a delivered batch is a strict
    * no-op — the idempotence foreachBatch's redelivery contract needs.
    * Public so StreamingSpec can drive batch-boundary-invariance
    * directly. */
  def mergeBatch(s: SparkSession, batch: DataFrame, targetDir: String,
      key: String, version: String): Unit = {
    val delta = latestState(batch, key, version).drop("n_changes")
    val dir = new java.io.File(targetDir)
    val merged =
      if (!dir.exists() || dir.listFiles() == null ||
        !dir.listFiles().exists(_.getName.endsWith(".parquet"))) delta
      else {
        val base = s.read.parquet(targetDir)
        // the same aggregation kernel over base ∪ delta: a replayed
        // batch can never regress a row
        latestState(base.unionByName(delta), key, version).drop("n_changes")
      }
    val out = merged.localCheckpoint() // cut lineage off the files being replaced
    out.write.mode("overwrite").parquet(targetDir)
  }

  /** q89: batch kernel over the events CDC log — user_id keyed, ts
    * versioned. The aggregate output IS the materialized latest-state
    * table (one row per user), proven against a window-ranked oracle. */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
    latestState(ev, "user_id", "ts")
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"), col("n_changes"))
      .orderBy(col("user_id").asc_nulls_last)
  }

  private val q89Sql =
    """WITH ranked AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
      |  FROM events)
      |SELECT user_id, ts AS last_ts, event_id AS last_event_id,
      |  event_type AS last_event_type, value AS last_value,
      |  n_changes
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id ASC NULLS LAST""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q89_stream_upsert", q89, Some(q89Sql)))
}
