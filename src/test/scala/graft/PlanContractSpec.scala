package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate (VERDICT r6 #4): for a curated set of
  * scale-critical batch queries, count the load-bearing physical-plan
  * features of the EXECUTED (post-AQE) plan — shuffle exchanges,
  * broadcast exchanges, exchange reuses, sort-merge vs broadcast joins,
  * whole-stage-codegen spans, dynamic-partition-pruning — and diff them
  * against the checked-in contract (`src/test/resources/plan-contracts.tsv`).
  * A silent plan regression (lost broadcast, extra shuffle, a codegen
  * break) then fails `sbt test` instead of waiting for a bench anomaly.
  *
  * After an INTENTIONAL plan change, regenerate with
  *   GRAFT_WRITE_PLAN_CONTRACTS=1 sbt "testOnly graft.PlanContractSpec"
  * and review the .tsv diff like any other code change.
  */
class PlanContractSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The contracted queries: every batch operator whose doc-comment
    * makes a plan-shape claim (zero-exchange, map-only, broadcast side,
    * salting, DPP) plus the TPC-H join pipelines. Streaming queries are
    * excluded (their micro-batch plans are asserted in StreamingSpec). */
  private val Contracted: Seq[String] = Seq(
    "q01_scan_filter", "q06_groupby_count", "q07_tpch_q1",
    "q12_join_sortmerge", "q13_join_broadcast", "q15_join_semi_anti",
    "q16_join_skew", "q20_topk", "q26_dedup_exact", "q27_dedup_minhash",
    "q28_dedup_simhash", "q29_ann_brute", "q35_corpus_pipeline",
    "q41_salted_agg", "q42_tpch_q3", "q43_tpch_q5", "q50_bucketed_join",
    "q53_stratified_mix", "q59_doc_chunks", "q60_batch_sessions",
    "q62_fuzzy_join", "q63_tpch_q7", "q64_tpch_q18", "q66_upsert",
    "q70_pii_redact", "q77_dpp_join")

  private val ContractPath =
    java.nio.file.Paths.get("src/test/resources/plan-contracts.tsv")

  /** Walk the FINAL adaptive plan, descending through the AQE wrappers
    * (QueryStageExec is a leaf node whose real subtree hangs off
    * `.plan`). ReusedExchangeExec is NOT descended — its shared subtree
    * is already walked at its original site; reuse is its own count. */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ => Seq.empty
    }
    p +: (inner ++ p.children.flatMap(walk))
  }

  private final case class Shape(shuffles: Int, broadcasts: Int, reuses: Int,
      smj: Int, bhj: Int, bnlj: Int, codegen: Int, dpp: Boolean) {
    def render: String = s"shuffles=$shuffles broadcasts=$broadcasts " +
      s"reuses=$reuses smj=$smj bhj=$bhj bnlj=$bnlj codegen=$codegen dpp=$dpp"
  }

  private def shapeOf(df: DataFrame): Shape = {
    // collect() executes the DataFrame's OWN QueryExecution (a noop
    // write would build a separate command QE and leave this one
    // unfinalized), so the walk below sees the post-AQE final plan
    df.collect()
    val nodes = walk(df.queryExecution.executedPlan)
    // codegen spans are counted from the FORMATTED executed plan: under
    // AQE the WholeStageCodegen wrappers live in the materialized stage
    // clones, not in the `QueryStageExec.plan` subtrees the node walk
    // sees, but the formatted explain prints the real spans
    val formatted = Metrics.executedPlanString(df.queryExecution)
    Shape(
      shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike]),
      broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeLike]),
      reuses = nodes.count(_.isInstanceOf[ReusedExchangeExec]),
      smj = nodes.count(_.isInstanceOf[SortMergeJoinExec]),
      bhj = nodes.count(_.isInstanceOf[BroadcastHashJoinExec]),
      bnlj = nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      codegen = "\\[codegen id : (\\d+)\\]".r
        .findAllMatchIn(formatted).map(_.group(1)).toSet.size,
      dpp = formatted.contains("dynamicpruning"))
  }

  private lazy val observed: Map[String, Shape] =
    Contracted.map { name =>
      name -> shapeOf(SparkEntry.queries(name)(spark, sf))
    }.toMap

  private lazy val writeMode = sys.env.contains("GRAFT_WRITE_PLAN_CONTRACTS")

  test("contract file is regenerable and covers exactly the curated set") {
    if (writeMode) {
      val lines = Contracted.map(n => s"$n\t${observed(n).render}")
      java.nio.file.Files.createDirectories(ContractPath.getParent)
      java.nio.file.Files.writeString(ContractPath,
        lines.mkString("", "\n", "\n"))
      info(s"wrote ${Contracted.size} contracts to $ContractPath")
    } else {
      assert(java.nio.file.Files.exists(ContractPath),
        s"missing $ContractPath — run with GRAFT_WRITE_PLAN_CONTRACTS=1 once")
      val keys = scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(ContractPath)).asScala
        .filter(_.nonEmpty).map(_.split("\t")(0)).toSet
      assert(keys == Contracted.toSet,
        s"contract file out of sync: missing=${Contracted.toSet.diff(keys)} " +
          s"stale=${keys.diff(Contracted.toSet)} — regenerate")
    }
  }

  private lazy val contracts: Map[String, String] =
    if (writeMode) observed.map { case (k, v) => k -> v.render }
    else scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(ContractPath)).asScala
      .filter(_.nonEmpty)
      .map { l => val Array(k, v) = l.split("\t", 2); k -> v }.toMap

  Contracted.foreach { name =>
    test(s"$name executed-plan shape matches its contract") {
      val got = observed(name).render
      assert(got == contracts(name),
        s"\nPLAN REGRESSION in $name\n  contract: ${contracts(name)}\n" +
          s"  observed: $got\nIf intentional, regenerate with " +
          "GRAFT_WRITE_PLAN_CONTRACTS=1 sbt 'testOnly graft.PlanContractSpec'")
    }
  }
}
