package graft.kv

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Arbitrary, Gen, Prop, Test => PropTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the ORDER-PRESERVING rowkey encoding — the
  * soundness foundation of plan-time shard pruning and in-shard range
  * clipping: for every pair of values, unsigned byte order of the
  * encoded keys must equal value order (the reference's raw big-endian
  * keys violate this for negative numerics, SURVEY.md §4b). */
class BytesCodecPropSpec extends AnyFunSuite {

  /** scalacheck driver (the scalatest bridge artifact isn't a declared
    * dependency): 200 cases per property, fail loud with the shrunk
    * counterexample. */
  private def check(p: Prop): Unit = {
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def sgn(i: Int): Int = Integer.signum(i)

  private def orderPreserved[T](dt: DataType, cmp: (T, T) => Int)(
      implicit a: Arbitrary[T]): Prop =
    Prop.forAll { (x: T, y: T) =>
      sgn(BytesCodec.compareKeys(
        BytesCodec.encodeKey(dt, x), BytesCodec.encodeKey(dt, y))) == sgn(cmp(x, y))
    }

  test("long keys order like values over the full signed domain") {
    check(orderPreserved[Long](LongType, java.lang.Long.compare))
  }
  test("int keys order like values") {
    check(orderPreserved[Int](IntegerType, Integer.compare))
  }
  test("short keys order like values") {
    check(orderPreserved[Short](ShortType, (a, b) => java.lang.Short.compare(a, b)))
  }
  test("byte keys order like values") {
    check(orderPreserved[Byte](ByteType, (a, b) => java.lang.Byte.compare(a, b)))
  }

  private val finiteDouble: Gen[Double] =
    Arbitrary.arbitrary[Double].suchThat(d => !d.isNaN)
  test("double keys order like SQL doubles (incl. -0.0 = 0.0, infinities)") {
    check(Prop.forAll(finiteDouble, finiteDouble) { (x, y) =>
      val expect = if (x == y) 0 else sgn(java.lang.Double.compare(x, y))
      sgn(BytesCodec.compareKeys(
        BytesCodec.encodeKey(DoubleType, x), BytesCodec.encodeKey(DoubleType, y))) == expect
    })
  }

  private val finiteFloat: Gen[Float] =
    Arbitrary.arbitrary[Float].suchThat(f => !f.isNaN)
  test("float keys order like SQL floats") {
    check(Prop.forAll(finiteFloat, finiteFloat) { (x, y) =>
      val expect = if (x == y) 0 else sgn(java.lang.Float.compare(x, y))
      sgn(BytesCodec.compareKeys(
        BytesCodec.encodeKey(FloatType, x), BytesCodec.encodeKey(FloatType, y))) == expect
    })
  }

  test("string keys order like UTF8String binary order (full Unicode)") {
    check(Prop.forAll { (x: String, y: String) =>
      val ux = UTF8String.fromString(x)
      val uy = UTF8String.fromString(y)
      sgn(BytesCodec.compareKeys(
        BytesCodec.encodeKey(StringType, ux),
        BytesCodec.encodeKey(StringType, uy))) == sgn(ux.binaryCompare(uy))
    })
  }

  test("timestamp keys order like micros at the stored millis precision") {
    check(Prop.forAll { (x: Long, y: Long) =>
      // stored precision is millis (reference parity): compare floored
      val fx = Math.floorDiv(x, 1000L); val fy = Math.floorDiv(y, 1000L)
      sgn(BytesCodec.compareKeys(
        BytesCodec.encodeKey(TimestampType, x),
        BytesCodec.encodeKey(TimestampType, y))) == sgn(java.lang.Long.compare(fx, fy))
    })
  }

  test("round-trip: decodeKey(encodeKey(v)) == v for integral keys") {
    check(Prop.forAll { (v: Long) =>
      BytesCodec.decodeKey(LongType, BytesCodec.encodeKey(LongType, v)) == v })
    check(Prop.forAll { (v: Int) =>
      BytesCodec.decodeKey(IntegerType, BytesCodec.encodeKey(IntegerType, v)) == v })
  }

  test("round-trip: cell values survive encode/decode for numerics") {
    check(Prop.forAll { (v: Long) =>
      BytesCodec.decode(LongType, BytesCodec.encode(LongType, v)) == v })
    check(Prop.forAll(finiteDouble) { v =>
      BytesCodec.decode(DoubleType, BytesCodec.encode(DoubleType, v)) == v })
  }

  test("round-trip: calendar-interval cells survive encode/decode over the full domain") {
    // the type the reference declares (`DefaultSource.scala:54`) but
    // crashes reading (`HbasePartitionReader.scala:67` TODO) — here the
    // (months, days, micros) triple must survive exactly, including
    // negative and extreme components (mixed-sign intervals are legal)
    check(Prop.forAll { (m: Int, d: Int, us: Long) =>
      val iv = new org.apache.spark.unsafe.types.CalendarInterval(m, d, us)
      BytesCodec.decode(CalendarIntervalType,
        BytesCodec.encode(CalendarIntervalType, iv)) == iv
    })
  }
}
