package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over a pair DataFrame — the domain/source-weighting pass a
  * training-data pipeline runs on its document-link or near-dup graph
  * (quality propagation over links, per Page et al. 1999). The reference
  * carries iterative jobs as chained shuffle stages (any
  * `ShuffleDependency` DAG, celeborn:
  * tests/spark-it/.../CelebornFetchFailureSuite.scala:169-210 chains
  * shuffles); Spark-side each iteration is one join + one map-side-
  * combined aggregation keyed by node id.
  *
  * Determinism across engines (the oracle replays the iterations as
  * chained CTEs): per-edge contributions `pr/outdeg` accumulate in
  * DECIMAL(28,16) so the incoming sum is partition-order-independent,
  * and every new rank is rounded to 12 dp before the next round — both
  * engines then carry bit-identical doubles through all iterations.
  *
  * Scale: nodes/edges shuffle only by node id (partial+final min/sum
  * aggregation — a celebrity node degrades into map-side partial sums,
  * not a crowded reducer); per-round `localCheckpoint` cuts the lineage
  * chain exactly like [[Clusters.connectedComponents]]. The one driver
  * scalar is the node count.
  */
object Graphs {

  /** Test seam: invoked with the round number after each round's
    * materialization. FaultToleranceSpec uses it to vaporize the
    * fixpoint's cached blocks mid-run — the executor-loss storage
    * failure a single-JVM local session cannot produce by killing a
    * process. No-op in production. */
  private[graft] var afterRound: Int => Unit = _ => ()

  /** PUBLIC API — `iters` rounds of damped PageRank on directed edges
    * (src, dst). Nodes with no out-edges contribute nothing (simplified
    * model, no dangling redistribution); every node incident to an edge
    * gets a rank. Returns (id, pr) with pr rounded to 12 dp.
    *
    * `checkpointDir`: when set, per-round materialization uses RELIABLE
    * `checkpoint()` into that directory instead of executor-local
    * `localCheckpoint()` — same trade as
    * [[Clusters.connectedComponents]]: local blocks die with their
    * executor (a lost executor mid-fixpoint kills the job, proven by
    * the FaultToleranceSpec differential); reliable rounds survive and
    * lost partitions re-read the files. Same operational notes apply
    * (per-job directory, sweep old round snapshots). */
  def pageRank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame = {
    // setCheckpointDir mutates SHARED SparkContext state; save and (in the
    // finally below) restore the previous directory so a concurrent job
    // using reliable checkpointing is not silently redirected. Round
    // snapshots accumulate under `dir` — run with
    // spark.cleaner.referenceTracking.cleanCheckpoints=true or sweep the
    // per-job directory afterwards (same note as connectedComponents).
    val sc = edges.sparkSession.sparkContext
    val prevCkptDir = sc.getCheckpointDir
    val mat: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        sc.setCheckpointDir(dir)
        df => df.checkpoint()
      case None => df => df.localCheckpoint()
    }
    try pageRankRounds(mat, edges, iters, damping)
    finally if (checkpointDir.isDefined)
      sc.setCheckpointDir(prevCkptDir.orNull)
  }

  /** Fixpoint body of [[pageRank]]; `mat` is the per-round materializer
    * (eager checkpoint, so all rounds run before the caller restores the
    * checkpoint directory). */
  private def pageRankRounds(mat: DataFrame => DataFrame, edges: DataFrame,
      iters: Int, damping: Double): DataFrame = {
    val e = mat(edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst")).distinct())
    val nodes = mat(e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct())
    val n = nodes.count() // driver scalar, like the q55 convergence count
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var pr = nodes.withColumn("pr", round(lit(1.0 / n), 12))
    for (i <- 1 to iters) {
      val contrib = e.join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"),
          (col("pr") / col("outdeg")).cast("decimal(28,16)").as("w"))
        .groupBy(col("id")).agg(sum(col("w")).as("in_w"))
      pr = mat(pr.select(col("id")).join(contrib, Seq("id"), "left")
        .select(col("id"),
          round(lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("in_w").cast("double"), lit(0.0)), 12).as("pr")))
      afterRound(i)
    }
    pr
  }

  /** q74: PageRank over a deterministic 100-node graph derived from
    * lineitem (src = l_orderkey mod 100, dst = l_partkey mod 100), 3
    * iterations, damping 0.85 — identically derivable in SQL, so the
    * oracle replays the exact iteration arithmetic as chained CTEs. */
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    val edges = li.select((col("l_orderkey") % 100).as("src"),
      (col("l_partkey") % 100).as("dst"))
    pageRank(edges, iters = 3, damping = 0.85)
      .orderBy(col("id").asc_nulls_last)
  }

  // double literals must be forced in DuckDB ('0.85' alone is DECIMAL
  // arithmetic there; Spark side computes driver-side Scala doubles)
  private val q74Sql = {
    def it(prev: String, out: String): String =
      s"""c_$out AS (SELECT e.dst AS id,
         |  SUM(CAST(p.pr / od.outdeg AS DECIMAL(28,16))) AS w
         |  FROM e JOIN $prev p ON e.src = p.id JOIN od ON e.src = od.src
         |  GROUP BY e.dst),
         |$out AS (SELECT nd.id,
         |  round((1.0::DOUBLE - 0.85::DOUBLE) / nn.n +
         |    0.85::DOUBLE * COALESCE(CAST(c.w AS DOUBLE), 0.0::DOUBLE), 12) AS pr
         |  FROM nodes nd CROSS JOIN nn LEFT JOIN c_$out c ON nd.id = c.id)""".stripMargin
    s"""WITH e AS (SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 100 AS dst
       |  FROM lineitem WHERE l_orderkey % 100 != l_partkey % 100),
       |nodes AS (SELECT DISTINCT id FROM
       |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
       |nn AS (SELECT COUNT(*)::BIGINT AS n FROM nodes),
       |od AS (SELECT src, COUNT(*)::BIGINT AS outdeg FROM e GROUP BY src),
       |pr0 AS (SELECT id, round(1.0::DOUBLE / nn.n, 12) AS pr
       |  FROM nodes CROSS JOIN nn),
       |${it("pr0", "pr1")},
       |${it("pr1", "pr2")},
       |${it("pr2", "pr3")}
       |SELECT id, pr FROM pr3 ORDER BY id ASC NULLS LAST""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q74_pagerank", q74, Some(q74Sql)))
}
