package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Corpus-curation operators (q70-q73): semantics on hand-computed
  * fixtures + the plan-shape claims behind their 100 TB story. */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("redactPii masks emails, IPs, phones and counts each class") {
    val df = Seq(
      (1L, "mail a.b-c@host.org and 10.0.0.255 then +44-20-7946"),
      (2L, "nothing to redact here"),
      (3L, "two mails x@y.z a@b.c one ip 1.2.3.4")).toDF("id", "t")
    val out = Curation.redactPii(df, "t").orderBy("id").collect()
    assert(out(0).getAs[String]("redacted") ===
      "mail <EMAIL> and <IP> then <PHONE>")
    assert(out(0).getAs[Long]("n_emails") === 1L)
    assert(out(0).getAs[Long]("n_ips") === 1L)
    assert(out(0).getAs[Long]("n_phones") === 1L)
    assert(out(1).getAs[String]("redacted") === "nothing to redact here")
    assert(out(1).getAs[Long]("n_emails") === 0L)
    assert(out(2).getAs[Long]("n_emails") === 2L)
    assert(out(2).getAs[String]("redacted") === "two mails <EMAIL> <EMAIL> one ip <IP>")
  }

  test("collapseRepeats removes only CONSECUTIVE duplicate tokens") {
    val df = Seq((1L, "a a the the the b a"), (2L, "x"), (3L, "y y")).toDF("id", "t")
    val out = Curation.collapseRepeats(df, "t")
      .select(col("id"), array_join(col("collapsed"), " ").as("c"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out === Array((1L, "a the b a"), (2L, "x"), (3L, "y")))
  }

  test("unigramNll: rare-token docs score higher; NLL is exact vs hand calc") {
    // corpus: "a a a b" -> p(a)=3/4, p(b)=1/4
    val df = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = Curation.unigramNll(df).collect()
    val nllA = -math.log(3.0 / 4.0)
    val nllB = -math.log(1.0 / 4.0)
    assert(out(0).getAs[Long]("n_tokens") === 3L)
    assert(math.abs(out(0).getAs[Double]("avg_nll") - nllA) < 1e-5)
    assert(math.abs(out(1).getAs[Double]("avg_nll") - nllB) < 1e-5)
    assert(out(1).getAs[Double]("avg_nll") > out(0).getAs[Double]("avg_nll"),
      "doc of rare tokens must score higher NLL")
  }

  test("bpePairCounts counts adjacent pairs with deterministic ties") {
    val df = Seq((1L, "lo w lo w"), (2L, "lo w e r"), (3L, "x")).toDF("doc_id", "text")
    val out = Curation.bpePairCounts(df, 3).as[(String, Long)].collect()
    // pairs: doc1: "lo w","w lo","lo w"; doc2: "lo w","w e","e r" -> "lo w"=3
    assert(out(0) === ("lo w", 3L))
    assert(out.length === 3)
    assert(out(1)._2 === 1L && out(2)._2 === 1L && out(1)._1 < out(2)._1,
      s"ties must break on pair asc: ${out.toSeq}")
  }

  test("plan shapes: redact/collapse are map-only; unigram broadcasts the vocabulary") {
    val docs = Tables.t(spark, sf, "documents")
    val redactPlan = Curation.redactPii(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!redactPlan.contains("Exchange"), "redactPii must not shuffle")
    val collapsePlan = Curation.collapseRepeats(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!collapsePlan.contains("Exchange"), "collapseRepeats must not shuffle")
    val nllPlan = Curation.unigramNll(docs).queryExecution.executedPlan.toString
    assert(nllPlan.contains("BroadcastHashJoin") || nllPlan.contains("BroadcastNestedLoop"),
      "vocabulary NLL frame must broadcast, corpus must not shuffle by token:\n" + nllPlan)
    val pairsPlan = Curation.bpePairCounts(docs, 50).queryExecution.executedPlan.toString
    assert(pairsPlan.contains("TakeOrderedAndProject"),
      "top-k pairs must be TakeOrderedAndProject, not a global sort:\n" + pairsPlan)
  }
}
