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

  /** PUBLIC API — exact triangle count over an undirected graph given
    * as (src, dst) pairs (direction and duplicates ignored). The
    * degree-ordered "compact-forward" orientation (Latapy 2008; the
    * MapReduce form is Suri & Vassilvitskii, WWW'11): orient every edge
    * from its (degree, id)-smaller endpoint to the larger, producing a
    * DAG whose max out-degree is O(√m) — the wedge join then touches
    * O(m^1.5) pairs worst-case instead of Σdeg² (a star node's wedges
    * explode in the naive orientation; here the hub's edges all point
    * INTO it). Each triangle is counted exactly once: its
    * (degree-order) smallest vertex closes the wedge.
    *
    * Plan: dedup → degree agg (node-keyed, map-side combined) → two
    * broadcast-or-SMJ joins keyed on node ids. No driver-side state. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val ord = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("s"),
      when(fwd, col("v")).otherwise(col("u")).as("t"))
    val e1 = ord.select(col("s").as("a"), col("t").as("b"))
    val e2 = ord.select(col("s").as("b"), col("t").as("c"))
    val e3 = ord.select(col("s").as("a"), col("t").as("c"))
    e1.join(e2, "b").join(e3, Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Q120: triangle count of the part CO-PURCHASE graph — parts are
    * adjacent when some order contains both (the market-basket graph).
    * Unlike a fixed modular projection (which densifies as the corpus
    * grows and densities blow the wedge join up cubically), the
    * co-purchase node space is the part table, which scales WITH the
    * data — edge density stays bounded at any SF. Pair generation is
    * one orderkey-keyed self-join (orders hold a handful of lines
    * each, so per-key pair fan-out is tiny and bounded). */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    // one ship-year window: baskets co-purchased in 1996 (exact triangle
    // work grows ~m·√m; the year slice keeps the fixture entry's m
    // proportionate — production callers pick their own slice)
    val li = Tables.t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val edges = li.select(col("k"), col("l_partkey").as("src"))
      .join(li.select(col("k"), col("l_partkey").as("dst")), "k")
      .where(col("src") < col("dst"))
      .select(col("src"), col("dst"))
    triangleCount(edges)
  }

  private val q120Sql =
    """WITH raw AS (
      |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |  WHERE a.l_partkey < b.l_partkey
      |    AND a.l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND a.l_shipdate < TIMESTAMP '1997-01-01'
      |    AND b.l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND b.l_shipdate < TIMESTAMP '1997-01-01'),
      |und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM raw),
      |deg AS (SELECT id, COUNT(*) AS d FROM (
      |  SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und)
      |  GROUP BY id),
      |ord AS (
      |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
      |           THEN u ELSE v END AS s,
      |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
      |           THEN v ELSE u END AS t
      |  FROM und JOIN deg du ON u = du.id JOIN deg dv ON v = dv.id)
      |SELECT COUNT(*) AS n_triangles
      |FROM ord e1 JOIN ord e2 ON e1.t = e2.s
      |WHERE EXISTS (SELECT 1 FROM ord e3 WHERE e3.s = e1.s AND e3.t = e2.t)""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q74_pagerank", q74, Some(q74Sql)),
    QueryDef("q120_triangles", q120, Some(q120Sql)))
}
