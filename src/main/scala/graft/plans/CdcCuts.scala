package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking cut points: the 1-based character
  * positions p (p >= W) where the polynomial rolling hash of the last
  * [[CdcCuts.W]] code points ≡ 0 (mod [[CdcCuts.D]]).
  *
  * Same cut points as the declarative form in `Dedup.cdcChunks`
  * (`filter(sequence(W, n), p -> pmod(aggregate(...)) = 0)`) but TRUE
  * rolling: O(1) multiply-adds per character instead of O(W) — the
  * outgoing code point's contribution is subtracted via the
  * precomputed B^(W-1) mod P before the incoming one is folded in.
  * Both forms reduce each step mod P, and mod is a ring homomorphism,
  * so the chains are value-identical (differential-asserted over the
  * corpus in ExpressionSpec).
  *
  * Hash units are Unicode CODE POINTS — exactly DuckDB's `ord()`, so
  * oracle parity holds on any text; the declarative form's `ascii()`
  * matches only where text is ASCII (the fixture corpus is).
  */
case class CdcCuts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cuts"

  override def nullSafeEval(input: Any): Any =
    CdcCuts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CdcCuts$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  /** Must stay in sync with Dedup's CDC constants (single source there
    * would invert the package dependency; DedupBoundsSpec pins them). */
  val W = 8
  val B = 31L
  val P = 1000003L
  val D = 32L

  /** B^(W-1) mod P — the outgoing code point's positional weight. */
  private val BW1: Long = {
    var x = 1L
    var k = 1
    while (k < W) { x = x * B % P; k += 1 }
    x
  }

  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val ring = new Array[Long](W)
    val out = scala.collection.mutable.ArrayBuilder.make[Int]
    var h = 0L
    var count = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      count += 1
      if (count > W) {
        // ring still holds the value from W positions back at this slot
        h = ((h - ring((count - 1) % W) * BW1 % P + P) * B + cp) % P
      } else {
        h = (h * B + cp) % P
      }
      ring((count - 1) % W) = cp
      if (count >= W && h % D == 0) out += count
    }
    new GenericArrayData(out.result())
  }
}
