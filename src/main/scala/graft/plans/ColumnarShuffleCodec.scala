package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Columnar exchange serializer prototype (SURVEY §2A row 25).
  *
  * The reference's columnar shuffle re-batches rows to columns per reduce
  * partition before push, with per-column null bitmaps and dictionary or
  * passthrough encoding, because column-major bytes compress far better
  * than row-major (celeborn:
  * client-spark/spark-3-columnar-shuffle/src/main/scala/org/apache/spark/sql/execution/columnar/CelebornColumnType.scala:183-638,
  * CelebornColumnarBatchSerializer.scala:45, dictionary threshold in
  * CelebornColumnarBatchBuilder.scala). This object is the Spark-native
  * analogue: a lossless column-major codec over `InternalRow` batches,
  * used by `ColumnarBench` to measure the compressed-bytes delta against
  * the row-major `UnsafeRow` wire format that Spark's shuffle actually
  * ships, so the keep-or-drop decision in BASELINE.md is evidence-backed.
  *
  * Type coverage mirrors the reference's supported set
  * (CelebornColumnarBatchBuilder.scala:35-46: int, long, string, boolean,
  * short, byte, float, double, compact decimal) plus DateType and
  * TimestampType, which our engine supports natively (the reference falls
  * back to row shuffle for them). Unsupported types (arrays, maps,
  * structs) → `supports` = false, callers keep the row path — the same
  * fallback contract as the reference.
  *
  * Wire format, one batch:
  * {{{
  *   int32  rowCount
  *   per field (schema order):
  *     nullBitmap: ceil(rowCount/8) bytes, bit i set = row i is NULL
  *     fixed-width types: value per NON-NULL row (packed, no null slots)
  *     decimal(<=18): unscaled long per non-null row
  *     string: 1 flag byte (1 = dictionary, 0 = passthrough), then
  *       dict:  int32 dictSize, dictSize × (int32 len + bytes),
  *              int32 index per non-null row
  *       plain: int32 len + bytes per non-null row
  * }}}
  * The string encoder computes both sizes and picks the smaller, so a
  * high-cardinality column never pays the dictionary overhead — the
  * adaptive choice the reference makes per column batch.
  */
object ColumnarShuffleCodec {

  def supports(schema: StructType): Boolean = schema.fields.forall { f =>
    f.dataType match {
      case IntegerType | LongType | StringType | BooleanType | ShortType |
          ByteType | FloatType | DoubleType | DateType | TimestampType |
          TimestampNTZType => true
      case d: DecimalType => d.precision <= Decimal.MAX_LONG_DIGITS
      case _ => false
    }
  }

  def encode(rows: Array[InternalRow], schema: StructType): Array[Byte] = {
    require(supports(schema), s"unsupported schema for columnar codec: $schema")
    val n = rows.length
    val bos = new ByteArrayOutputStream(1 << 16)
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    var c = 0
    while (c < schema.length) {
      val bitmap = new Array[Byte]((n + 7) / 8)
      var i = 0
      while (i < n) {
        if (rows(i).isNullAt(c)) bitmap(i >> 3) = (bitmap(i >> 3) | (1 << (i & 7))).toByte
        i += 1
      }
      out.write(bitmap)
      schema(c).dataType match {
        case StringType => encodeStrings(rows, c, out)
        case dt =>
          i = 0
          while (i < n) {
            if (!rows(i).isNullAt(c)) dt match {
              case IntegerType | DateType => out.writeInt(rows(i).getInt(c))
              case LongType | TimestampType | TimestampNTZType =>
                out.writeLong(rows(i).getLong(c))
              case BooleanType => out.writeBoolean(rows(i).getBoolean(c))
              case ShortType => out.writeShort(rows(i).getShort(c))
              case ByteType => out.writeByte(rows(i).getByte(c))
              case FloatType => out.writeFloat(rows(i).getFloat(c))
              case DoubleType => out.writeDouble(rows(i).getDouble(c))
              case d: DecimalType =>
                out.writeLong(rows(i).getDecimal(c, d.precision, d.scale).toUnscaledLong)
              case other => throw new IllegalStateException(other.toString)
            }
            i += 1
          }
      }
      c += 1
    }
    out.flush()
    bos.toByteArray
  }

  private def encodeStrings(rows: Array[InternalRow], c: Int, out: DataOutputStream): Unit = {
    val n = rows.length
    // one pass: gather non-null values + distinct dictionary
    val values = new java.util.ArrayList[UTF8String](n)
    val dict = new java.util.LinkedHashMap[UTF8String, Integer]()
    var passthroughBytes = 0L
    var dictEntryBytes = 0L
    var i = 0
    while (i < n) {
      if (!rows(i).isNullAt(c)) {
        val s = rows(i).getUTF8String(c).copy()
        values.add(s)
        passthroughBytes += 4 + s.numBytes()
        if (!dict.containsKey(s)) {
          dict.put(s, dict.size())
          dictEntryBytes += 4 + s.numBytes()
        }
      }
      i += 1
    }
    val dictTotal = 4 + dictEntryBytes + 4L * values.size()
    val useDict = dictTotal < passthroughBytes
    out.writeByte(if (useDict) 1 else 0)
    if (useDict) {
      out.writeInt(dict.size())
      val it = dict.keySet().iterator()
      while (it.hasNext) {
        val s = it.next()
        val b = s.getBytes
        out.writeInt(b.length); out.write(b)
      }
      val vit = values.iterator()
      while (vit.hasNext) out.writeInt(dict.get(vit.next()))
    } else {
      val vit = values.iterator()
      while (vit.hasNext) {
        val b = vit.next().getBytes
        out.writeInt(b.length); out.write(b)
      }
    }
  }

  def decode(bytes: Array[Byte], schema: StructType): Array[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val cols = new Array[Array[Any]](schema.length)
    var c = 0
    while (c < schema.length) {
      val bitmap = new Array[Byte]((n + 7) / 8)
      in.readFully(bitmap)
      def isNull(i: Int): Boolean = (bitmap(i >> 3) & (1 << (i & 7))) != 0
      val col = new Array[Any](n)
      schema(c).dataType match {
        case StringType =>
          val useDict = in.readByte() == 1
          if (useDict) {
            val entries = new Array[UTF8String](in.readInt())
            var d = 0
            while (d < entries.length) {
              val b = new Array[Byte](in.readInt()); in.readFully(b)
              entries(d) = UTF8String.fromBytes(b); d += 1
            }
            var i = 0
            while (i < n) { if (!isNull(i)) col(i) = entries(in.readInt()); i += 1 }
          } else {
            var i = 0
            while (i < n) {
              if (!isNull(i)) {
                val b = new Array[Byte](in.readInt()); in.readFully(b)
                col(i) = UTF8String.fromBytes(b)
              }
              i += 1
            }
          }
        case dt =>
          var i = 0
          while (i < n) {
            if (!isNull(i)) col(i) = dt match {
              case IntegerType | DateType => in.readInt()
              case LongType | TimestampType | TimestampNTZType => in.readLong()
              case BooleanType => in.readBoolean()
              case ShortType => in.readShort()
              case ByteType => in.readByte()
              case FloatType => in.readFloat()
              case DoubleType => in.readDouble()
              case d: DecimalType =>
                Decimal.createUnsafe(in.readLong(), d.precision, d.scale)
              case other => throw new IllegalStateException(other.toString)
            }
            i += 1
          }
      }
      cols(c) = col
      c += 1
    }
    val rows = new Array[InternalRow](n)
    var i = 0
    while (i < n) {
      val vals = new Array[Any](schema.length)
      c = 0
      while (c < schema.length) { vals(c) = cols(c)(i); c += 1 }
      rows(i) = new GenericInternalRow(vals)
      i += 1
    }
    rows
  }

  /** Row-major baseline: the `UnsafeRowSerializer` wire format Spark's
    * shuffle actually writes (4-byte row size + row bytes per record —
    * spark: sql/core/.../UnsafeRowSerializer.scala). Used as the
    * denominator of the columnar experiment. */
  def encodeRowMajor(rows: Array[InternalRow], schema: StructType): Array[Byte] = {
    val proj = UnsafeProjection.create(schema)
    val bos = new ByteArrayOutputStream(1 << 16)
    val out = new DataOutputStream(bos)
    val buf = new Array[Byte](4096)
    var i = 0
    while (i < rows.length) {
      val u = proj(rows(i))
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, buf)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}
