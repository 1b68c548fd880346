package graft.kv

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte encodings compatible with HBase's `Bytes` utility semantics, per
  * the reference's type table (SURVEY.md §1.3; decode sites
  * `/root/reference/src/main/scala/com/dm/hbase/spark3/datasource/HbasePartitionReader.scala:60-80`):
  * big-endian fixed-width numerics, UTF-8 strings, single-byte booleans,
  * and temporal types stored as epoch-MILLIS longs (the reference writer
  * stores `Instant.toEpochMilli`, `TestDataWriter.scala:54-63`).
  *
  * Unlike the reference, comparisons NEVER happen on these bytes —
  * predicate evaluation decodes first (the reference's byte-order
  * comparator is wrong for negative numerics, SURVEY.md §4b).
  */
object BytesCodec {

  // ---- encode (external JVM value → stored bytes) ----

  def encodeLong(v: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(v).array()
  def encodeInt(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()
  def encodeShort(v: Short): Array[Byte] = ByteBuffer.allocate(2).putShort(v).array()
  def encodeDouble(v: Double): Array[Byte] = encodeLong(java.lang.Double.doubleToLongBits(v))
  def encodeFloat(v: Float): Array[Byte] = encodeInt(java.lang.Float.floatToIntBits(v))
  def encodeBoolean(v: Boolean): Array[Byte] = Array(if (v) (-1).toByte else 0.toByte)
  def encodeString(v: String): Array[Byte] = v.getBytes(StandardCharsets.UTF_8)

  /** Encode a Catalyst-internal value of `dt` to stored bytes.
    * Temporal internal values (days / micros) are converted to the
    * reference's epoch-millis-long physical encoding. */
  def encode(dt: DataType, v: Any): Array[Byte] = dt match {
    case LongType      => encodeLong(v.asInstanceOf[Long])
    case IntegerType   => encodeInt(v.asInstanceOf[Int])
    case ShortType     => encodeShort(v.asInstanceOf[Short])
    case ByteType      => Array(v.asInstanceOf[Byte])
    case DoubleType    => encodeDouble(v.asInstanceOf[Double])
    case FloatType     => encodeFloat(v.asInstanceOf[Float])
    case BooleanType   => encodeBoolean(v.asInstanceOf[Boolean])
    case StringType    => encodeString(v.toString)
    case BinaryType    => v.asInstanceOf[Array[Byte]]
    case DateType      => // internal: days since epoch → millis at midnight UTC
      encodeLong(v.asInstanceOf[Int].toLong * 86400000L)
    case TimestampType => // internal: micros → millis (reference precision)
      encodeLong(Math.floorDiv(v.asInstanceOf[Long], 1000L))
    case CalendarIntervalType => // (months, days, micros) — the decode the
      // reference left as a TODO crash (`HbasePartitionReader.scala:67`)
      val ci = v.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
      val buf = ByteBuffer.allocate(16)
      buf.putInt(ci.months); buf.putInt(ci.days); buf.putLong(ci.microseconds)
      buf.array()
    // extensions beyond the reference (SURVEY.md §1.4):
    case dt: DecimalType if dt.precision <= 18 => // unscaled long, scale from catalog
      encodeLong(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toUnscaledLong)
    case ArrayType(FloatType, _) =>
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val buf = ByteBuffer.allocate(4 + 4 * a.numElements())
      buf.putInt(a.numElements())
      (0 until a.numElements()).foreach(i => buf.putFloat(a.getFloat(i)))
      buf.array()
    case MapType(StringType, StringType, _) =>
      val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val ks = m.keyArray(); val vs = m.valueArray()
      val kb = (0 until m.numElements()).map(i => ks.getUTF8String(i).getBytes)
      val vb = (0 until m.numElements()).map(i => vs.getUTF8String(i).getBytes)
      val total = 4 + kb.zip(vb).map { case (k2, v2) => 8 + k2.length + v2.length }.sum
      val buf = ByteBuffer.allocate(total)
      buf.putInt(m.numElements())
      kb.zip(vb).foreach { case (k2, v2) =>
        buf.putInt(k2.length); buf.put(k2); buf.putInt(v2.length); buf.put(v2)
      }
      buf.array()
    case other => throw new IllegalArgumentException(s"Unsupported KV type: $other")
  }

  // ---- decode (stored bytes → Catalyst internal value) ----

  // offset variants for the zero-copy batch decode path: read straight
  // out of a shard reader's internal buffer, no per-value slice copy
  def longAt(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 56) | ((b(off + 1) & 0xffL) << 48) |
      ((b(off + 2) & 0xffL) << 40) | ((b(off + 3) & 0xffL) << 32) |
      ((b(off + 4) & 0xffL) << 24) | ((b(off + 5) & 0xffL) << 16) |
      ((b(off + 6) & 0xffL) << 8) | (b(off + 7) & 0xffL)
  def intAt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  def shortAt(b: Array[Byte], off: Int): Short =
    (((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)).toShort

  def decodeLong(b: Array[Byte]): Long = ByteBuffer.wrap(b).getLong
  def decodeInt(b: Array[Byte]): Int = ByteBuffer.wrap(b).getInt
  def decodeShort(b: Array[Byte]): Short = ByteBuffer.wrap(b).getShort
  def decodeDouble(b: Array[Byte]): Double = java.lang.Double.longBitsToDouble(decodeLong(b))
  def decodeFloat(b: Array[Byte]): Float = java.lang.Float.intBitsToFloat(decodeInt(b))
  def decodeBoolean(b: Array[Byte]): Boolean = b(0) != 0

  /** Decode stored bytes to the Catalyst-internal representation of `dt`
    * (UTF8String for strings, days int for dates, micros long for
    * timestamps — the reference does the same conversions at
    * `HbasePartitionReader.scala:64-78`). */
  def decode(dt: DataType, b: Array[Byte]): Any = dt match {
    case LongType      => decodeLong(b)
    case IntegerType   => decodeInt(b)
    case ShortType     => decodeShort(b)
    case ByteType      => b(0)
    case DoubleType    => decodeDouble(b)
    case FloatType     => decodeFloat(b)
    case BooleanType   => decodeBoolean(b)
    case StringType    => UTF8String.fromBytes(b)
    case BinaryType    => b
    case DateType      => (decodeLong(b) / 86400000L).toInt
    case TimestampType => Math.multiplyExact(decodeLong(b), 1000L)
    case CalendarIntervalType =>
      val buf = ByteBuffer.wrap(b)
      new org.apache.spark.unsafe.types.CalendarInterval(buf.getInt, buf.getInt, buf.getLong)
    case dt: DecimalType if dt.precision <= 18 =>
      org.apache.spark.sql.types.Decimal(decodeLong(b), dt.precision, dt.scale)
    case ArrayType(FloatType, _) =>
      val buf = ByteBuffer.wrap(b)
      val n = buf.getInt
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill(n)(buf.getFloat))
    case MapType(StringType, StringType, _) =>
      val buf = ByteBuffer.wrap(b)
      val n = buf.getInt
      val keys = new Array[Any](n); val vals = new Array[Any](n)
      var i = 0
      while (i < n) {
        val kl = buf.getInt; val kb = new Array[Byte](kl); buf.get(kb)
        val vl = buf.getInt; val vb = new Array[Byte](vl); buf.get(vb)
        keys(i) = UTF8String.fromBytes(kb); vals(i) = UTF8String.fromBytes(vb)
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, vals)
    case other => throw new IllegalArgumentException(s"Unsupported KV type: $other")
  }

  // ---- order-preserving ROWKEY encoding ----
  // The reference stores raw big-endian keys, where unsigned byte order
  // diverges from value order for negative numerics (SURVEY.md §4b) —
  // which would make rowkey-range shard pruning unsound. Rowkeys here use
  // an order-preserving transform instead (sign-bit flip for integrals,
  // IEEE total-order for floats), the standard manual fix HBase schema
  // designers apply. Cell VALUES keep the reference's raw Bytes encoding.

  def encodeKey(dt: DataType, v: Any): Array[Byte] = dt match {
    case LongType      => encodeLong(v.asInstanceOf[Long] ^ Long.MinValue)
    case IntegerType   => encodeInt(v.asInstanceOf[Int] ^ Int.MinValue)
    case ShortType     => encodeShort((v.asInstanceOf[Short] ^ Short.MinValue).toShort)
    case ByteType      => Array(((v.asInstanceOf[Byte] ^ 0x80) & 0xff).toByte)
    case DoubleType    =>
      // normalize -0.0 → 0.0 so SQL-equal values share one key encoding
      val d = v.asInstanceOf[Double]
      val bits = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
      encodeLong(if (bits >= 0) bits ^ Long.MinValue else ~bits)
    case FloatType     =>
      val f = v.asInstanceOf[Float]
      val bits = java.lang.Float.floatToIntBits(if (f == 0.0f) 0.0f else f)
      encodeInt(if (bits >= 0) bits ^ Int.MinValue else ~bits)
    case DateType      => encodeLong(v.asInstanceOf[Int].toLong * 86400000L ^ Long.MinValue)
    case TimestampType => encodeLong(Math.floorDiv(v.asInstanceOf[Long], 1000L) ^ Long.MinValue)
    case BooleanType | StringType | BinaryType => encode(dt, v)
    case other => throw new IllegalArgumentException(s"Unsupported rowkey type: $other")
  }

  def decodeKey(dt: DataType, b: Array[Byte]): Any = dt match {
    case LongType      => decodeLong(b) ^ Long.MinValue
    case IntegerType   => decodeInt(b) ^ Int.MinValue
    case ShortType     => (decodeShort(b) ^ Short.MinValue).toShort
    case ByteType      => ((b(0) ^ 0x80) & 0xff).toByte
    case DoubleType    =>
      val raw = decodeLong(b)
      java.lang.Double.longBitsToDouble(if (raw < 0) raw ^ Long.MinValue else ~raw)
    case FloatType     =>
      val raw = decodeInt(b)
      java.lang.Float.intBitsToFloat(if (raw < 0) raw ^ Int.MinValue else ~raw)
    case DateType      => (((decodeLong(b) ^ Long.MinValue)) / 86400000L).toInt
    case TimestampType => Math.multiplyExact(decodeLong(b) ^ Long.MinValue, 1000L)
    case BooleanType | StringType | BinaryType => decode(dt, b)
    case other => throw new IllegalArgumentException(s"Unsupported rowkey type: $other")
  }

  /** Smallest byte string strictly greater than EVERY string with
    * prefix `p`, under unsigned lexicographic order: increment the last
    * non-0xFF byte and truncate after it. None when p is empty or all
    * 0xFF — no finite upper bound exists. The prefix-seek bound for
    * StartsWith pushdown (rowkey ranges and zone maps). */
  def prefixSuccessor(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xFF.toByte) i -= 1
    if (i < 0) None
    else {
      val r = java.util.Arrays.copyOf(p, i + 1)
      r(i) = ((r(i) & 0xff) + 1).toByte
      Some(r)
    }
  }

  /** Unsigned lexicographic byte comparison (HBase rowkey order). */
  def compareKeys(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = (a(i) & 0xff) - (b(i) & 0xff)
      if (x != 0) return x
      i += 1
    }
    a.length - b.length
  }
}
