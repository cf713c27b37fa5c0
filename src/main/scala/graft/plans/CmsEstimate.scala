package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native point query over a serialized Count-Min sketch: the estimated
  * frequency of `item` in the sketch produced by Spark's built-in
  * `count_min_sketch` aggregate. Spark ships the BUILD side (the
  * aggregate, with map-side combine via mergeInPlace) but no expression
  * to READ the sketch back inside a query — this closes that gap
  * without a Scala UDF, following the preference order custom
  * `Expression` > UDF (cosine_sim/cdc_cuts precedent).
  *
  * Item hashing matches the aggregate's: Spark's CountMinSketchAgg adds
  * strings as their UTF-8 bytes (addBinary), so the query side hashes
  * the same bytes. Deserialization cost is per-call; the expression is
  * meant for the REPORT side of a sketch pipeline (sources × probed
  * items rows), never a corpus-sized stream — the corpus-sized work is
  * the build aggregate, which stays Spark's codegen'd implementation.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CmsEstimate.compute(
      sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, it) =>
      s"${ev.value} = graft.plans.CmsEstimate$$.MODULE$$.compute($sk, $it);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def compute(sketch: Array[Byte], item: UTF8String): Long =
    CountMinSketch.readFrom(sketch).estimateCount(item.getBytes)
}
