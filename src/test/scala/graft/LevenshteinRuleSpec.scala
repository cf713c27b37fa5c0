package graft

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LevenshteinRewrite: bounded edit-distance predicates become the
  * banded thresholded form, with identical results and null behavior.
  */
class LevenshteinRuleSpec extends AnyFunSuite {
  import SparkTestSession._

  private def thresholded(df: org.apache.spark.sql.DataFrame): Seq[Levenshtein] =
    df.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case l: Levenshtein if l.threshold.isDefined => l })

  private lazy val docs = {
    Graft.register(spark) // installs the rule via extraOptimizations
    import spark.implicits._
    Seq((1L, "kitten", "sitting"), (2L, "flaw", "lawn"),
      (3L, "abc", null.asInstanceOf[String]))
      .toDF("id", "a", "b")
  }

  test("<=, <, and = forms all rewrite to the banded threshold") {
    // parquet-backed (a LocalRelation filter would be constant-folded
    // away by ConvertToLocalRelation before any plan inspection)
    Graft.register(spark)
    val d = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    def lev = levenshtein(col("text"), col("lang"))
    assert(thresholded(d.where(lev <= 3)).forall(_.threshold.isDefined))
    assert(thresholded(d.where(lev <= 3)).nonEmpty)
    assert(thresholded(d.where(lev < 4)).nonEmpty)
    assert(thresholded(d.where(lev === 2)).nonEmpty)
    // non-literal bound: left alone
    assert(thresholded(d.where(lev <= col("doc_id"))).isEmpty)
  }

  test("rewritten predicates keep exact semantics, including nulls") {
    import spark.implicits._
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("id").as[Long].collect().toSeq.sorted
    // lev(kitten,sitting)=3, lev(flaw,lawn)=2, null row never matches
    assert(ids(docs.where(levenshtein(col("a"), col("b")) <= 3)) == Seq(1L, 2L))
    assert(ids(docs.where(levenshtein(col("a"), col("b")) < 3)) == Seq(2L))
    assert(ids(docs.where(levenshtein(col("a"), col("b")) === 3)) == Seq(1L))
    assert(ids(docs.where(levenshtein(col("a"), col("b")) <= 0)) == Seq())
  }
}
