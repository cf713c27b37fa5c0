package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunking (q59), batch sessionization (q60) and label centroids (q61)
  * on planted fixtures with hand-computed expectations.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("chunks tile each doc: strides reconstruct the text, sizes bounded") {
    import spark.implicits._
    val text = (1 to 50).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, text), (8L, "just three tokens")).toDF("doc_id", "text")
    val out = operators.Chunking.chunkDocs(docs, chunkSize = 32, stride = 24)
      .collect()
    val byDoc = out.groupBy(_.getLong(0))
    // doc 7: 50 tokens -> starts 0, 24, 48 -> 3 chunks of 32, 26, 2 tokens
    val c7 = byDoc(7L).sortBy(_.getAs[Long]("chunk_id"))
    assert(c7.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(32L, 26L, 2L))
    // stride-prefixes of the chunks reconstruct the original text
    val rebuilt = c7.map(r => r.getAs[String]("chunk_text").split(" ").take(24))
      .flatten.take(50).mkString(" ")
    assert(rebuilt == text)
    // doc 8: single chunk, whole text
    assert(byDoc(8L).map(_.getAs[String]("chunk_text")).toSeq == Seq("just three tokens"))
  }

  test("sessionize splits on gaps > threshold, per user") {
    import spark.implicits._
    def ts(min: Int) = new Timestamp(min * 60000L)
    // user 1: events at 0, 10, 50 min (gap 40 > 30 splits) -> 2 sessions
    // user 2: events at 0, 29, 58 min (gaps 29 <= 30)      -> 1 session
    val events = Seq(
      (1L, ts(0), 100L), (2L, ts(10), 101L), (3L, ts(50), 102L),
      (4L, ts(0), 200L), (5L, ts(29), 201L), (6L, ts(58), 202L))
      .map { case (e, t, u) => (e, t, u / 100, "x", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Sessionize.sessionize(events)
      .select(col("user_id"), col("session_idx"), col("n_events"), col("dur_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 10L * 60000000L), (1L, 2L, 1L, 0L),
      (2L, 1L, 3L, 58L * 60000000L)))
  }

  test("batch sessionization (q60) agrees with session_window (q25) " +
    "session-for-session") {
    val batch = SparkEntry.queries("q60_batch_sessions")(spark, sf)
      .select(col("user_id"), col("start_ts"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val sw = SparkEntry.queries("q25_window_session")(spark, sf)
      .select(col("user_id"), col("s_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(batch == sw,
      s"${batch.size} batch vs ${sw.size} session_window sessions; " +
        s"only-batch=${(batch -- sw).take(3)} only-sw=${(sw -- batch).take(3)}")
  }

  test("funnel (q68) counts only users who hit the stages in order") {
    import spark.implicits._
    def ts(min: Int) = new Timestamp(min * 60000L)
    // user 1: view(0) click(5) purchase(9)  -> reaches all 3
    // user 2: click(0) view(5) purchase(9)  -> click BEFORE view: stops at view
    // user 3: view(0) purchase(5)           -> no click: stops after view
    val events = Seq(
      (1L, "view", 0), (1L, "click", 5), (1L, "purchase", 9),
      (2L, "click", 0), (2L, "view", 5), (2L, "purchase", 9),
      (3L, "view", 0), (3L, "purchase", 5))
      .map { case (u, t, m) => (u, ts(m), t) }
      .toDF("user_id", "ts", "event_type")
    val out = operators.Funnel.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // user 2 DOES reach click: its earliest click >= its view is... none
    // (click was before view), so it stops at view. Only user 1 converts.
    assert(out == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }

  test("retention (q69) buckets users by first week and counts return weeks") {
    import spark.implicits._
    def wk(w: Int, d: Int = 0) = new Timestamp((w * 7L + d) * 86400000L)
    // user 1: weeks 0, 1, 3; user 2: weeks 0, 3; user 3: week 1 only
    val events = Seq(
      (1L, wk(0)), (1L, wk(1)), (1L, wk(3)), (1L, wk(3, 2)), // same week twice
      (2L, wk(0)), (2L, wk(3)),
      (3L, wk(1)))
      .toDF("user_id", "ts")
    val out = operators.Cohorts.retention(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 2L, // cohort week-0
      (1L, 0L) -> 1L))                                // cohort week-1: user 3
  }

  test("label centroids are the exact elementwise means") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(1.0f, -2.0f), 0), (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(0.5f, 0.25f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = operators.Embeddings.labelCentroids(e)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(out == Map(
      (0, 0) -> 2.0, (0, 1) -> 1.0,
      (1, 0) -> 0.5, (1, 1) -> 0.25))
  }
}
