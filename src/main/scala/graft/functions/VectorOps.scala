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
}
