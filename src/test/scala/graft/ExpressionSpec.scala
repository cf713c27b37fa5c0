package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps

/** Native Catalyst expressions: semantics + bit-identity with the
  * higher-order-function formulation they replace (the oracle contract
  * depends on exact double equality). */
class ExpressionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cosine_sim is bit-identical to the zip_with/aggregate cosine") {
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("x").join(e.as("y"),
        col("x.vec_id") < col("y.vec_id") && col("y.vec_id") < 40)
      .select(
        VectorOps.cosineFast(spark, "x.embedding", "y.embedding").as("fast"),
        VectorOps.cosineExpr("x.embedding", "y.embedding").as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"fast=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("cosine_sim null and type behavior") {
    Graft.register(spark)
    val row = spark.sql(
      "SELECT cosine_sim(cast(null as array<float>), array(cast(1.0 as float)))")
      .collect()(0)
    assert(row.isNullAt(0), "null input must yield null")
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1), array(2))").collect()
    }
    assert(err.getMessage.contains("array<float>"))
  }

  test("dot_product is bit-identical to the zip_with/aggregate dot") {
    Graft.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("x").join(e.as("y"),
        col("x.vec_id") < col("y.vec_id") && col("y.vec_id") < 40)
      .select(
        expr("dot_product(x.embedding, y.embedding)").as("fast"),
        VectorOps.dotExpr("x.embedding", "y.embedding").as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"fast=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("dot_product null and type behavior") {
    Graft.register(spark)
    val row = spark.sql(
      "SELECT dot_product(cast(null as array<float>), array(cast(1.0 as float)))")
      .collect()(0)
    assert(row.isNullAt(0), "null input must yield null")
    val err = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1), array(2))").collect()
    }
    assert(err.getMessage.contains("array<float>"))
  }

  test("cosine_sim participates in whole-stage codegen") {
    Graft.register(spark)
    val e = Tables.t(spark, sf, "embeddings").limit(10)
    e.createOrReplaceTempView("emb_cg")
    val plan = spark.sql(
      "SELECT cosine_sim(embedding, embedding) FROM emb_cg")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [cosine_sim"), s"no codegen span:\n$plan")
  }
}
