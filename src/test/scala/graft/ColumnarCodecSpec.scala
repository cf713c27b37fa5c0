package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ColumnarShuffleCodec

/** Columnar exchange codec (SURVEY §2A row 25): lossless round-trip over
  * the reference's supported type set + dates/timestamps, adaptive
  * dictionary choice, and a measured compression win on shuffle-shaped
  * data — the evidence behind the BASELINE.md keep-or-drop entry.
  * Mirrors celeborn's columnar suite intent
  * (ColumnarHashBasedShuffleWriterSuiteJ.java,
  * CelebornColumnarShuffleReaderSuite.scala) without its transport. */
class ColumnarCodecSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("sh", ShortType),
    StructField("by", ByteType),
    StructField("f", FloatType),
    StructField("d", DoubleType),
    StructField("dec", DecimalType(12, 2)),
    StructField("dt", DateType),
    StructField("ts", TimestampType)))

  private def toInternal(rows: Seq[Row]): Array[InternalRow] = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
    rows.map(r => enc(r).copy().asInstanceOf[InternalRow]).toArray
  }

  private def mkRows(n: Int): Seq[Row] = (0 until n).map { i =>
    if (i % 7 == 3)
      Row(null, null, null, null, null, null, null, null, null, null, null)
    else Row(
      i, i.toLong * 1000003L, s"status-${i % 3}", i % 2 == 0, (i % 100).toShort,
      (i % 127).toByte, i * 0.5f, i * 0.25, BigDecimal(i * 7).setScale(2),
      new java.sql.Date(86400000L * (19000 + i % 365)),
      new java.sql.Timestamp(1700000000000L + i * 1000L))
  }

  test("round-trip is lossless across all supported types incl. nulls") {
    val rows = toInternal(mkRows(500))
    val back = ColumnarShuffleCodec.decode(
      ColumnarShuffleCodec.encode(rows, schema), schema)
    assert(back.length === rows.length)
    rows.zip(back).foreach { case (a, b) =>
      schema.indices.foreach { c =>
        assert(a.isNullAt(c) === b.isNullAt(c), s"null mismatch col $c")
        if (!a.isNullAt(c))
          assert(a.get(c, schema(c).dataType) === b.get(c, schema(c).dataType),
            s"value mismatch col $c (${schema(c).name})")
      }
    }
  }

  test("unsupported types (arrays/structs) are rejected -> row-path fallback") {
    // same fallback contract as the reference: arrays/maps/structs keep
    // the row shuffle (CelebornColumnarBatchBuilder.scala:46)
    assert(!ColumnarShuffleCodec.supports(
      StructType(Seq(StructField("a", ArrayType(FloatType))))))
    assert(!ColumnarShuffleCodec.supports(
      StructType(Seq(StructField("m", MapType(StringType, LongType))))))
    assert(!ColumnarShuffleCodec.supports(
      StructType(Seq(StructField("big", DecimalType(28, 6))))))
    assert(ColumnarShuffleCodec.supports(schema))
  }

  test("low-cardinality strings dictionary-encode; columnar beats row-major raw") {
    val rows = toInternal(mkRows(2000))
    val col = ColumnarShuffleCodec.encode(rows, schema)
    val row = ColumnarShuffleCodec.encodeRowMajor(rows, schema)
    // the `s` column has 3 distinct values over ~1715 non-null rows: the
    // dictionary path must make the columnar frame materially smaller
    // than the UnsafeRow stream (which pads every field to 8 bytes)
    assert(col.length < row.length,
      s"columnar (${col.length}) not smaller than row-major (${row.length})")
    // and a high-cardinality string column must pick passthrough without
    // breaking the round-trip
    val hcSchema = StructType(Seq(StructField("u", StringType)))
    val hcEnc = ExpressionEncoder(RowEncoder.encoderFor(hcSchema)).createSerializer()
    val hc = (0 until 300).map(i => Row(s"unique-value-$i-${i * 31}"))
      .map(r => hcEnc(r).copy().asInstanceOf[InternalRow]).toArray
    val back = ColumnarShuffleCodec.decode(
      ColumnarShuffleCodec.encode(hc, hcSchema), hcSchema)
    hc.zip(back).foreach { case (a, b) =>
      assert(a.getUTF8String(0) === b.getUTF8String(0))
    }
  }
}
