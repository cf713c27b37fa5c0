package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q125 (A-ES weighted sampling), q126 (quantile transform), q127
  * (2-D skyline). Driver oracle owns exact correctness; here the laws:
  * weighting actually biases the draw, the transform is uniform, and
  * the sweep equals brute-force dominance on adversarial tie cases. */
class SamplingSkylineSpec extends AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  test("q125: the weighted draw overrepresents heavy documents") {
    val sample = SparkEntry.queries("q125_weighted_sample")(spark, sf)
      .collect().map(_.getLong(1).toDouble)
    val corpus = Tables.t(spark, sf, "documents")
      .select(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sampleMean = sample.sum / sample.length
    assert(sampleMean > corpus,
      s"inclusion ∝ n_chars must pull the sample mean ($sampleMean) above " +
        s"the corpus mean ($corpus)")
  }

  test("q126: every decile holds 10% ±1 row of its group") {
    val rows = SparkEntry.queries("q126_quantile_transform")(spark, sf).collect()
    val byG = rows.groupBy(_.getString(0))
    byG.foreach { case (g, rs) =>
      assert(rs.length == 10, s"group $g has ${rs.length} deciles")
      val total = rs.map(_.getLong(2)).sum
      rs.foreach { r =>
        val n = r.getLong(2)
        assert(math.abs(n - total / 10.0) <= total * 0.002 + 2,
          s"group $g decile ${r.getInt(1)}: $n of $total is not ~10%")
      }
    }
  }

  test("q127: sweep equals brute-force dominance, including tie shapes") {
    // duplicates (both survive), same-price dominated, equal-size
    // cheaper dominator, plain interior point
    val schema = StructType(Seq(StructField("p_partkey", LongType),
      StructField("p_retailprice", DoubleType), StructField("p_size", IntegerType)))
    val rows = Seq(
      Row(1L, 10.0, 5), Row(2L, 10.0, 5),   // duplicate pair -> both on front
      Row(3L, 10.0, 4),                      // same price, smaller size -> out
      Row(4L, 12.0, 5),                      // equal size, pricier -> out
      Row(5L, 8.0, 2), Row(6L, 15.0, 9),    // front members
      Row(7L, 14.0, 7))                      // interior -> out? (6 pricier/bigger; 1 cheaper/smaller) -> front
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = graft.operators.Skyline.skyline2d(df, "p_retailprice", "p_size")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val all = rows.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val want = all.filter { case (_, pp, ps) =>
      !all.exists { case (_, qp, qs) =>
        qp <= pp && qs >= ps && (qp < pp || qs > ps) }
    }.map(_._1).toSet
    assert(got == want, s"sweep=$got brute=$want")
  }
}
