package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graphs

/** PageRank (q74) + stream-static join (q75): hand-checked semantics
  * and the plan shapes behind their scale claims. */
class GraphsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("pageRank matches a hand-iterated reference on a 3-node cycle + sink") {
    // graph: 1->2, 2->3, 3->1 (cycle) and 1->4 (4 is a sink)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val got = Graphs.pageRank(edges, iters = 2, damping = 0.85)
      .orderBy("id").as[(Long, Double)].collect().toMap

    // hand iteration, same arithmetic (round to 12 dp each round)
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = 4
    val base = (1.0 - 0.85) / n
    var pr = Map(1L -> r12(1.0 / n), 2L -> r12(1.0 / n), 3L -> r12(1.0 / n), 4L -> r12(1.0 / n))
    val out = Map(1L -> 2L, 2L -> 1L, 3L -> 1L) // outdegrees (4 has none)
    for (_ <- 1 to 2) {
      val in = Map[Long, Seq[Long]](1L -> Seq(3L), 2L -> Seq(1L), 3L -> Seq(2L), 4L -> Seq(1L))
      pr = pr.keys.map { v =>
        val s = in(v).map(u => pr(u) / out(u)).sum
        v -> r12(base + 0.85 * s)
      }.toMap
    }
    pr.foreach { case (id, expect) =>
      assert(math.abs(got(id) - expect) < 1e-11, s"node $id: ${got(id)} vs $expect")
    }
    // nodes 2 and 4 share the sole in-neighbor 1 -> identical rank; the
    // cycle-closing nodes 1 and 3 dominate the sink
    assert(got(4L) === got(2L))
    assert(got(4L) < got(1L) && got(4L) < got(3L))
  }

  test("pageRank dedups parallel edges and drops self-loops") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graphs.pageRank(edges, iters = 1).orderBy("id")
      .as[(Long, Double)].collect().toMap
    // after dedup+self-loop removal: 1->2, 2->1, symmetric -> equal ranks
    assert(got(1L) === got(2L))
  }

  test("pageRank differential: first-attempt task failure does not change ranks") {
    // the fixpoint materializes per round (localCheckpoint); a task lost
    // while materializing the edge set must recompute from lineage and
    // converge to IDENTICAL ranks (FaultToleranceSpec discipline applied
    // to the round-5 iterative operator)
    import org.apache.spark.TaskContext
    val edges = Tables.t(spark, sf, "lineitem")
      .select((col("l_orderkey") % 50).as("src"), (col("l_partkey") % 50).as("dst"))
    val clean = Graphs.pageRank(edges, iters = 2).orderBy("id")
      .collect().map(_.toString).toSeq
    val flaky = edges.as[(Long, Long)].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("graft: injected first-attempt failure")
      it
    }.toDF("src", "dst")
    val injected = Graphs.pageRank(flaky, iters = 2).orderBy("id")
      .collect().map(_.toString).toSeq
    assert(injected === clean, "ranks differ after task retry")
  }

  test("q75 stream-static join: dim broadcasts; batch equivalence holds") {
    val ev = Tables.t(spark, sf, "events")
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("segment", col("user_id") % 5)
    // plan: the static dim must broadcast (stream side never shuffles
    // through the join)
    val plan = graft.streaming.StreamStaticJoin.enrich(ev, dim, "user_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast:\n$plan")

    // streaming result == batch join result
    val streamed = SparkEntry.queries("q75_stream_static_join")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = graft.streaming.StreamStaticJoin.enrich(ev, dim, "user_id")
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"), Canon.dsum(col("value"), 6).as("sum_value"))
      .orderBy(col("segment").asc_nulls_last, col("event_type").asc_nulls_last)
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
  }
}
