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

  test("l2_sq is bit-identical to the zip_with/aggregate squared L2") {
    Graft.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val hofL2 = "aggregate(zip_with(x.embedding, y.embedding, " +
      "(a, b) -> (cast(a as double) - cast(b as double)) * " +
      "(cast(a as double) - cast(b as double))), cast(0.0 as double), " +
      "(acc, p) -> acc + p)"
    val pairs = e.as("x").join(e.as("y"),
        col("x.vec_id") < col("y.vec_id") && col("y.vec_id") < 40)
      .select(
        expr("l2_sq(x.embedding, y.embedding)").as("fast"),
        expr(hofL2).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"fast=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("l2_sq null and type behavior") {
    Graft.register(spark)
    val row = spark.sql(
      "SELECT l2_sq(cast(null as array<float>), array(cast(1.0 as float)))")
      .collect()(0)
    assert(row.isNullAt(0), "null input must yield null")
    val err = intercept[Exception] {
      spark.sql("SELECT l2_sq(array(1), array(2))").collect()
    }
    assert(err.getMessage.contains("array<float>"))
  }

  test("GraftExtensions registers the SQL functions via withExtensions") {
    import org.apache.spark.sql.SparkSession
    val orig = spark // materialize the shared session (and its context) first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // fresh session object over the same SparkContext: getOrCreate only
      // applies extensions when it constructs a new SparkSession
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      assert(s2 ne orig, "expected a fresh session for extension injection")
      val r = s2.sql(
        """SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c,
          |       dot_product(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                   array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d""".stripMargin)
        .collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12, s"cosine: ${r.getDouble(0)}")
      assert(r.getDouble(1) == 11.0, s"dot: ${r.getDouble(1)}")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("cdc_cuts rolling hash equals the declarative per-window recompute") {
    // whole corpus + hand-made edges: short (< W), exactly W, empty-adjacent
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .union(spark.createDataFrame(Seq(
        (9001L, "ab"), (9002L, "exactly8"), (9003L, "ninechars"),
        (9004L, "x" * 500))).toDF("doc_id", "text"))
    val native = graft.operators.Dedup.cdcChunks(docs)
      .groupBy("doc_id").agg(sort_array(collect_list("chunk")).as("c"))
    val decl = graft.operators.Dedup.cdcChunksDeclarative(docs)
      .groupBy("doc_id").agg(sort_array(collect_list("chunk")).as("c"))
    assert(native.join(decl, Seq("doc_id"))
      .where(native("c") =!= decl("c")).count() === 0)
    assert(native.count() === decl.count())
  }

  test("cdc_cuts uses code points (DuckDB ord parity) and stays in codegen") {
    Graft.register(spark)
    // 'é' = U+00E9 (233): boundary iff the chain value matches ord(),
    // not the UTF-8 lead byte 0xC3 the declarative ascii() form would
    // see on some engines — pin the unit explicitly
    val got = spark.sql("SELECT cdc_cuts('aaaaaaaébbbbbbb')").collect()(0)
      .getSeq[Int](0)
    val expect = {
      val s = "aaaaaaaébbbbbbb"
      val cps = s.codePoints().toArray
      (graft.plans.CdcCuts.W to cps.length).filter { p =>
        var h = 0L
        for (i <- (p - graft.plans.CdcCuts.W) until p)
          h = (h * graft.plans.CdcCuts.B + cps(i)) % graft.plans.CdcCuts.P
        h % graft.plans.CdcCuts.D == 0
      }
    }
    assert(got === expect)
    // a literal argument constant-folds (interpreted eval path); the
    // codegen claim needs a real scan under the projection
    Tables.t(spark, sf, "documents").limit(5).createOrReplaceTempView("docs_cg")
    val plan = spark.sql("SELECT cdc_cuts(text) FROM docs_cg")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cdc_cuts"), s"no codegen span:\n$plan")
  }

  test("lsh_buckets null-element and type contract") {
    Graft.register(spark)
    // a null ELEMENT contributes exactly 0.0 to every plane projection
    // (r14 VERDICT item 7 — contractual, not an ArrayData accident), so
    // a nullable-element array hashes identically to the zero-filled one
    val withNull = spark.sql("SELECT lsh_buckets(array(cast(1.5 as float), " +
      "cast(null as float), cast(-2.25 as float)), 8, 12) AS b")
      .collect()(0).getSeq[Long](0)
    val zeroed = spark.sql("SELECT lsh_buckets(array(cast(1.5 as float), " +
      "cast(0.0 as float), cast(-2.25 as float)), 8, 12) AS b")
      .collect()(0).getSeq[Long](0)
    assert(withNull == zeroed)
    // null INPUT yields null (UnaryExpression null-intolerance)
    assert(spark.sql("SELECT lsh_buckets(cast(null as array<float>), 8, 12)")
      .collect()(0).isNullAt(0))
    // wrong element type is rejected at type-check, not at runtime
    val err = intercept[Exception] {
      spark.sql("SELECT lsh_buckets(array(1.0, 2.0), 8, 12)").collect()
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
