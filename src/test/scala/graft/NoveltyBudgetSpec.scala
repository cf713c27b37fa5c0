package graft

import org.scalatest.funsuite.AnyFunSuite

/** q138 (n-gram novelty) and q139 (greedy token-budget selection). */
class NoveltyBudgetSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q138: novelty is a valid fraction and the frontier reaches 1.0") {
    val rows = SparkEntry.queries("q138_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSh, nNov, nov) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nNov <= nSh && nov > 0 && nov <= 1.0, s"bad novelty row $r")
    }
    // some document is all-novel (its shingles appear nowhere earlier) —
    // at minimum the smallest doc_id carrying shingles
    assert(rows.exists(_.getDouble(3) == 1.0), "no fully-novel document")
  }

  test("q140: entropy bounded by ln(vocab); Gini a valid concentration index") {
    val rows = SparkEntry.queries("q140_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vocab, h, gini) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(h > 0 && h <= math.log(vocab.toDouble) + 1e-9,
        s"entropy out of [0, ln V]: $r")
      assert(gini >= 0 && gini < 1.0, s"gini out of range: $r")
    }
  }

  test("q139: selection is the maximal greedy prefix under the budget") {
    val rows = SparkEntry.queries("q139_budget_select")(spark, sf).collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getLong(3))
    assert(cums.sameElements(cums.sorted), "cumulative tokens not monotonic")
    assert(cums.last <= 10000L, s"budget exceeded: ${cums.last}")
    // prefix property: cum steps by exactly each row's token count
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) - a.getLong(3) == b.getLong(1),
        s"cum step mismatch between $a and $b")
    }
  }
}
