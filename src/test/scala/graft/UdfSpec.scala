package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit-level contract of Udfs.WeightedAvg's scaled-long buffer — the
  * overflow-headroom and exactness claims its doc-comment makes.
  * (Integration behavior is oracle-checked through q30_udf_udaf.)
  */
class UdfSpec extends AnyFunSuite {

  private val agg = new operators.Udfs.WeightedAvg

  test("scaled-long buffer has >1e8-row headroom at adversarial values") {
    // worst-case fixture magnitudes: price ~110k (cents 1.1e7), qty 50
    // (hundredths 5e3) -> per-row product 5.5e10; Long.MaxValue / perRow
    // is the number of max-valued rows one group can hold before overflow
    val perRow = math.round(110000.0 * 100.0) * math.round(50.0 * 100.0)
    val headroomRows = Long.MaxValue / perRow
    assert(headroomRows > 100000000L,
      s"headroom only $headroomRows max-valued rows per group")
  }

  test("finish is exact at a million-row hot group of max-valued rows") {
    // a million identical max-valued rows, assembled via merge of scaled
    // buffers (what partial aggregation produces): the weighted average
    // of identical rows must come back as exactly the row price
    val rows = 1000000L
    val price = 110000.0
    val qtyHundredths = math.round(50.0 * 100.0)
    val buf = (math.round(price * 100.0) * qtyHundredths * rows, qtyHundredths * rows)
    assert(buf._1 > 0 && buf._2 > 0, "buffer overflowed at 1e6 rows")
    assert(agg.finish(buf) == price, s"lost exactness: ${agg.finish(buf)}")
  }

  test("merge is associative and commutative on scaled buffers") {
    val a = (123456789L, 1000L)
    val b = (987654321L, 2000L)
    val c = (555555555L, 3000L)
    assert(agg.merge(a, b) == agg.merge(b, a))
    assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
  }

  test("empty group yields 0.0, not NaN") {
    assert(agg.finish(agg.zero) == 0.0)
  }
}
