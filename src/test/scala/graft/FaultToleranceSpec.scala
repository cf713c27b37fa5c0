package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fault-tolerance differential tests: the result of a shuffle-heavy
  * query must be IDENTICAL with and without injected task failures.
  *
  * This is the Spark-native mapping of the reference's fetch-failure
  * suites (tests/spark-it/.../CelebornFetchFailureSuite.scala:66-374 —
  * shuffle-read failure forces re-execution and the job result must not
  * change): where the reference re-fetches from replicas or triggers
  * shuffle re-registration, Spark recomputes the lost partition from
  * lineage. The differential check is the same: hash-compare the result
  * of a failure-injected run against a clean run.
  *
  * Two failure modes, mirroring SURVEY §2A rows 12-15/21:
  *  - task retry: an exception on the FIRST attempt of one reduce task;
  *    the scheduler re-runs that task (local[4,2] => maxFailures 2).
  *  - fetch failure: a FetchFailedException in the reduce stage; the
  *    DAGScheduler resubmits the upstream MAP stage and recomputes the
  *    shuffle output from lineage before retrying the reduce.
  */
class FaultToleranceSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** A genuinely shuffle-heavy query: wide agg over lineitem joined to
    * orders — one hash-partitioned exchange per side plus a final agg. */
  private def shuffleHeavy(): DataFrame =
    Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(Canon.dsum(col("l_quantity")).as("qty"),
        Canon.dsum(col("l_extendedprice")).as("price"))
      .join(Tables.t(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(Canon.dsum(col("qty")).as("sum_qty"),
        Canon.dsum(col("price")).as("sum_price"),
        count(lit(1)).as("n"))

  private def canonical(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("task-retry differential: first-attempt failure does not change the result") {
    val clean = canonical(shuffleHeavy())
    val injected = shuffleHeavy()
      .as[(String, Double, Double, Long)]
      .mapPartitions { it =>
        val tc = TaskContext.get()
        // fail exactly the first attempt of reduce partition 0; the
        // scheduler's retry (attemptNumber 1) passes through
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
          throw new RuntimeException("graft: injected first-attempt failure")
        it
      }
      .toDF("o_orderpriority", "sum_qty", "sum_price", "n")
    assert(canonical(injected) == clean,
      "retried result differs from clean run")
  }

  test("fetch-failure differential: map-stage recompute does not change the result") {
    val clean = canonical(shuffleHeavy())
    // RDD-level injection so the FetchFailedException can name a REAL
    // shuffle id from this job's own lineage (nearest ShuffleDependency)
    val rdd = shuffleHeavy().rdd
    def nearestShuffle(r: org.apache.spark.rdd.RDD[_]): Int =
      r.dependencies.collectFirst {
        case s: org.apache.spark.ShuffleDependency[_, _, _] => s.shuffleId
      }.getOrElse(nearestShuffle(r.dependencies.head.rdd))
    val sid = nearestShuffle(rdd)
    val injected = rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      // a FetchFailedException in stage attempt 0 makes the DAGScheduler
      // resubmit the parent map stage (lineage recompute) and re-run
      // this stage as attempt 1, which passes through
      if (tc.partitionId() == 0 && tc.stageAttemptNumber() == 0)
        org.apache.spark.graftinject.Inject.fetchFailed(sid,
          tc.partitionId(), "graft: injected fetch failure")
      it
    }
    assert(injected.collect().map(_.toString).sorted.toSeq == clean,
      "result after map-stage recompute differs from clean run")
  }

  test("connectedComponents with reliable checkpoint survives mid-iteration failures") {
    // The fixpoint's per-round materialization normally uses
    // localCheckpoint (executor-local blocks — lost with the executor).
    // With checkpointDir set, rounds persist to the reliable store; a
    // task failure inside an iteration recomputes from the checkpoint
    // FILES, not from the truncated (gone) lineage. In-process we can't
    // kill the executor, so the differential is failure-injected edges
    // + reliable rounds vs a clean local run.
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("src", "dst")
    val clean = canonical(operators.Clusters.connectedComponents(edges))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val injectedEdges = edges.as[(Long, Long)]
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.partitionId() == 0 && tc.attemptNumber() == 0)
          throw new RuntimeException("graft: injected first-attempt failure")
        it
      }
      .toDF("src", "dst")
    val survived = operators.Clusters.connectedComponents(
      injectedEdges, checkpointDir = Some(ckpt))
    assert(canonical(survived) == clean,
      "reliable-checkpoint fixpoint differs from clean run")
    // the rounds genuinely went through the reliable store
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(_.getFileName.toString.startsWith("rdd-")).count()
    assert(files > 0, s"no reliable checkpoint files written under $ckpt")
  }

  test("pageRank executor-loss mid-fixpoint: local blocks are fatal, reliable checkpoint recovers") {
    // Executor loss destroys an executor's cached blocks — including
    // localCheckpoint data, whose lineage has been TRUNCATED, so unlike
    // plain cached RDDs there is nothing to recompute from. A single-JVM
    // session cannot kill an executor, but the block layer is shared:
    // vaporizing the fixpoint's cached blocks through the
    // BlockManagerMaster is the same storage-level event. Differential:
    //  - localCheckpoint rounds + block loss after round 2 => job death
    //    with the checkpoint-block failure (proves the fragility claim);
    //  - checkpoint(dir) rounds + the same loss => completes, result
    //    identical to a clean run (round data re-read from FILES).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (2L, 4L))
      .toDF("src", "dst")
    val clean = canonical(operators.Graphs.pageRank(edges))
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    operators.Graphs.afterRound = r =>
      if (r == 2) org.apache.spark.graftinject.BlockLoss.removeRdds(
        sc, sc.getPersistentRDDs.keySet.toSet -- before)
    try {
      val ex = intercept[Exception] {
        operators.Graphs.pageRank(edges).collect()
      }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.toLowerCase.contains("checkpoint block"),
        s"expected checkpoint-block loss to be fatal, got: $msgs")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_pr_ckpt").toString
      val survived = operators.Graphs.pageRank(edges, checkpointDir = Some(ckpt))
      assert(canonical(survived) == clean,
        "reliable-checkpoint pageRank differs from clean run after block loss")
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(_.getFileName.toString.startsWith("rdd-")).count()
      assert(files > 0, s"no reliable checkpoint files written under $ckpt")
    } finally operators.Graphs.afterRound = _ => ()
  }
}
