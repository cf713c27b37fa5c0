package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q131 (Markov transitions) and q132 (GD logistic training). */
class TransitionLogRegSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q131: transition matrix is row-stochastic and conserves pair count") {
    val rows = SparkEntry.queries("q131_transitions")(spark, sf).collect()
    // per-src probabilities sum to 1 (up to the 9-dp rounding of each cell)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-6, s"src $src row sums to $total")
    }
    // pair conservation: Σn = Σ_users (events_u - 1)
    val pairSum = rows.map(_.getLong(2)).sum
    val expected = Tables.t(spark, sf, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1)).collect()(0).getLong(0)
    assert(pairSum == expected, s"pairs $pairSum != $expected")
  }

  test("q132: GD converges to the majority-class boundary on uninformative features") {
    val r = SparkEntry.queries("q132_logreg_train")(spark, sf).collect()(0)
    val (nCorrect, n) = (r.getLong(3), r.getLong(4))
    val majority = Tables.t(spark, sf, "documents")
      .agg(sum(when(col("lang") =!= "en", 1L).otherwise(0L))).collect()(0).getLong(0)
    // the fixture's features carry no signal (scaladoc), so the learned
    // boundary must equal the Bayes-optimal constant classifier
    assert(nCorrect == majority,
      s"learned accuracy $nCorrect/$n, majority baseline $majority")
    // and training is bit-deterministic: a second run reproduces the row
    val r2 = SparkEntry.queries("q132_logreg_train")(spark, sf).collect()(0)
    assert(r.toString == r2.toString, "training is not deterministic")
  }
}
