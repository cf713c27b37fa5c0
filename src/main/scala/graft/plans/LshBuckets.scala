package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All of a vector's LSH table buckets in ONE native expression pass.
  *
  * The round-13 shape built each of the nTables·bitsPerTable sign bits
  * as its own `dot_product(embedding, <64-float literal>)` fold inside
  * one Project; past ~a dozen folds the generated stage leaves
  * whole-stage codegen and the per-plane evaluation cost jumps ~250x
  * (measured r14: 200k vectors × 144 planes = 120 s, ~1 s per plane —
  * vs 1.4 s TOTAL for this expression). Here the plane matrix is one
  * static float[] reference and the whole signature is two tight
  * primitive loops, so the generated code size is CONSTANT in the
  * plane count and the stage always stays in codegen.
  *
  * Parity contract (the q29_lsh_cands / q29_lsh_scaled oracles replay
  * this in SQL): each plane's projection accumulates
  * `(double) x[i] * (double) plane[i]` left-to-right — identical to
  * [[DotProduct]]'s fold and to DuckDB's left-associated
  * `CAST(e[i] AS DOUBLE)*c + …` chain over the same values, so a sign
  * can never flip between engines. Plane components are md5-derived
  * integers in [-1000, 1000] ([[LshBuckets.planeComponent]] — exact in
  * float); plane index = table·[[LshBuckets.MaxBitsPerTable]] + bit,
  * so a b-bit bucket is the MSB-first PREFIX of the table's widest
  * bucket (the property the width-election oracle uses).
  *
  * Output: array&lt;long&gt; of nTables bucket values, bucket =
  * Σ_i sign_i · 2^(bits−1−i).
  *
  * Null contract (r14 VERDICT item 7): the input type-check accepts
  * `array&lt;float&gt;` regardless of element nullability — parquet list
  * columns read back with `containsNull = true` even when no element
  * is null, so rejecting the type would reject every on-disk embedding
  * column. A null ELEMENT contributes exactly 0.0 to every plane
  * projection (checked explicitly in both eval paths, asserted in
  * ExpressionSpec) — previously that value fell out of ArrayData
  * implementation details (zeroed null regions / null-unboxing);
  * now it is contractual.
  */
case class LshBuckets(child: Expression, nTables: Int, bitsPerTable: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  @transient private lazy val nPlanes = nTables * bitsPerTable
  /** Flat [plane][dim] matrix; plane p of table t sits at
    * t·bitsPerTable + p but DRAWS its components from global plane id
    * t·MaxBitsPerTable + p, so narrower widths are prefixes. */
  @transient private[plans] lazy val flatPlanes: Array[Float] = {
    val a = new Array[Float](nPlanes * LshBuckets.Dim)
    var t = 0
    while (t < nTables) {
      var i = 0
      while (i < bitsPerTable) {
        val g = t * LshBuckets.MaxBitsPerTable + i
        var d = 0
        while (d < LshBuckets.Dim) {
          a((t * bitsPerTable + i) * LshBuckets.Dim + d) =
            LshBuckets.planeComponent(g, d).toFloat
          d += 1
        }
        i += 1
      }
      t += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(LshBuckets.Dim, x.numElements())
    val out = new Array[Long](nTables)
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      val base = p * LshBuckets.Dim
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i))
          dot += x.getFloat(i).toDouble * flatPlanes(base + i).toDouble
        i += 1
      }
      if (dot >= 0.0)
        out(p / bitsPerTable) |= 1L << (bitsPerTable - 1 - p % bitsPerTable)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val planes = ctx.addReferenceObj("lshPlanes", flatPlanes, "float[]")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |long[] $out = new long[$nTables];
         |int $n = java.lang.Math.min(${LshBuckets.Dim}, $x.numElements());
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$x.isNullAt($i)) {
         |      $dot += (double) $x.getFloat($i)
         |        * (double) $planes[$p * ${LshBuckets.Dim} + $i];
         |    }
         |  }
         |  if ($dot >= 0.0) {
         |    $out[$p / $bitsPerTable] |=
         |      1L << ($bitsPerTable - 1 - $p % $bitsPerTable);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  /** Embedding dimensionality of the engine's vector columns. */
  val Dim = 64

  /** Widest supported per-table bucket; plane ids are allotted per
    * table in blocks of this size (see class doc). */
  val MaxBitsPerTable = 12

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived integer mapped to [-1000, 1000] — exact in float, so
    * the oracle can inline the same integers. (Canonical home of the
    * constant shared with `operators.Similarity`.) */
  def planeComponent(p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$d".getBytes("UTF-8"))
      .take(7).map("%02x".format(_)).mkString
    val v = java.lang.Long.parseLong(hex, 16)
    ((v % 2001L) - 1000L).toDouble
  }
}
