package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Differential test: the per-partition COMPILED predicate path
  * ([[FilterEval.compile]], the scan hot loop) must agree with the
  * interpreted reference evaluator ([[FilterEval.eval]]) on every
  * pushable filter shape over adversarial decoded values — nulls
  * (missing cells), ±0.0, NaN boundaries via infinities, negative
  * integrals, cross-plane strings, and cross-type Number literals
  * (int column vs long literal and so on). The interpreted form is the
  * semantics spec; the compiled form exists only for speed. */
class FilterEvalSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("i", IntegerType),
    StructField("sh", ShortType), StructField("by", ByteType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("s", StringType), StructField("b", BooleanType),
    StructField("dt", DateType), StructField("ts", TimestampType)))
  private val dts: Map[String, DataType] =
    schema.fields.map(x => x.name -> x.dataType).toMap
  private val idx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap

  private def rndValue(rnd: scala.util.Random, dt: DataType): Any =
    if (rnd.nextInt(5) == 0) null
    else dt match {
      case LongType => rnd.nextInt(5) match {
        case 0 => Long.MinValue; case 1 => Long.MaxValue; case 2 => -1L
        case _ => rnd.nextLong() % 1000L
      }
      case IntegerType => rnd.nextInt(5) match {
        case 0 => Int.MinValue; case 1 => Int.MaxValue; case _ => rnd.nextInt(1000) - 500
      }
      case ShortType => (rnd.nextInt(2000) - 1000).toShort
      case ByteType => (rnd.nextInt(256) - 128).toByte
      case DoubleType => rnd.nextInt(8) match {
        case 0 => 0.0; case 1 => -0.0; case 2 => Double.PositiveInfinity
        case 3 => Double.NegativeInfinity; case _ => rnd.nextGaussian() * 100
      }
      case FloatType => rnd.nextInt(6) match {
        case 0 => 0.0f; case 1 => -0.0f; case _ => rnd.nextFloat() * 100 - 50
      }
      case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(
        rnd.nextInt(4) match {
          case 0 => ""; case 1 => "abc"
          case 2 => new String(Character.toChars(0x10400)) // SMP
          case _ => ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(3))
        })
      case BooleanType => rnd.nextBoolean()
      case DateType => rnd.nextInt(40000) - 20000
      case TimestampType => rnd.nextLong() % 4102444800000000L
      case other => sys.error(s"no generator for $other")
    }

  /** Literal as a user/Spark would supply it (external form). */
  private def rndLiteral(rnd: scala.util.Random, dt: DataType): Any = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      // cross-type Number literals on purpose
      rnd.nextInt(3) match {
        case 0 => rnd.nextInt(1000) - 500
        case 1 => (rnd.nextInt(1000) - 500).toLong
        case _ => java.lang.Short.valueOf((rnd.nextInt(200) - 100).toShort)
      }
    case DoubleType | FloatType => rnd.nextInt(4) match {
      case 0 => 0.0; case 1 => -0.0; case _ => rnd.nextGaussian() * 100
    }
    case StringType => rnd.nextInt(3) match {
      case 0 => "abc"; case 1 => ""; case _ => ('a' + rnd.nextInt(26)).toChar.toString
    }
    case BooleanType => rnd.nextBoolean()
    case DateType => java.sql.Date.valueOf("2001-06-15")
    case TimestampType => java.sql.Timestamp.valueOf("2001-06-15 12:34:56.789")
    case other => sys.error(s"no literal generator for $other")
  }

  private def rndFilter(rnd: scala.util.Random, depth: Int): Filter = {
    val name = schema.fieldNames(rnd.nextInt(schema.fieldNames.length))
    val dt = dts(name)
    def lit: Any = rndLiteral(rnd, dt)
    // null literals on purpose: x IN (…, NULL) and x <=> NULL have
    // distinct three-valued semantics the evaluators must agree on
    def litOrNull: Any = if (rnd.nextInt(6) == 0) null else lit
    rnd.nextInt(if (depth > 0) 15 else 12) match {
      case 0 => EqualTo(name, lit)
      case 1 => LessThan(name, lit)
      case 2 => LessThanOrEqual(name, lit)
      case 3 => GreaterThan(name, lit)
      case 4 => GreaterThanOrEqual(name, lit)
      case 5 => In(name, Array.fill(1 + rnd.nextInt(4))(litOrNull))
      case 6 => IsNull(name)
      case 7 => IsNotNull(name)
      case 8 => StringStartsWith("s", "a")
      case 9 => StringContains("s", "b")
      case 10 => StringEndsWith("s", "c")
      case 11 => EqualNullSafe(name, litOrNull)
      case 12 => And(rndFilter(rnd, depth - 1), rndFilter(rnd, depth - 1))
      case 13 => Or(rndFilter(rnd, depth - 1), rndFilter(rnd, depth - 1))
      case _ => Not(rndFilter(rnd, depth - 1))
    }
  }

  test("compiled predicates agree with the interpreted evaluator on random filters and rows") {
    val rnd = new scala.util.Random(20260812)
    val scratch = new Array[Any](schema.length)
    val getByName: String => Any = n => scratch(idx(n))
    for (trial <- 1 to 2000) {
      val f = rndFilter(rnd, 2)
      val compiled = FilterEval.compile(Array(f), idx, dts, scratch)
      for (_ <- 1 to 20) {
        var i = 0
        while (i < schema.length) {
          scratch(i) = rndValue(rnd, schema.fields(i).dataType); i += 1
        }
        val expected = FilterEval.eval(f, getByName, dts)
        assert(compiled() == expected,
          s"trial $trial: compiled != interpreted for $f over ${scratch.toSeq}")
      }
    }
  }

  test("three-valued truth table: NOT / <=> / IN-with-NULL on null operands") {
    val scratch = new Array[Any](schema.length)
    val getByName: String => Any = n => scratch(idx(n))
    def run(f: Filter, values: Map[String, Any]): Boolean = {
      schema.fieldNames.zipWithIndex.foreach { case (n, i) =>
        scratch(i) = values.getOrElse(n, null)
      }
      val interp = FilterEval.eval(f, getByName, dts)
      val compiled = FilterEval.compile(Array(f), idx, dts, scratch)()
      assert(interp == compiled, s"paths disagree on $f over $values")
      interp
    }
    val abc = org.apache.spark.unsafe.types.UTF8String.fromString("abc")
    // NOT(l = 5): null l → UNKNOWN → row dropped (NOT must not flip it)
    assert(!run(Not(EqualTo("l", 5L)), Map.empty))
    assert(run(Not(EqualTo("l", 5L)), Map("l" -> 7L)))
    assert(!run(Not(EqualTo("l", 5L)), Map("l" -> 5L)))
    // NOT(l = NULL): UNKNOWN regardless of l
    assert(!run(Not(EqualTo("l", null)), Map("l" -> 7L)))
    // <=> is never UNKNOWN: NOT(l <=> 5) with null l is TRUE
    assert(run(Not(EqualNullSafe("l", 5L)), Map.empty))
    assert(run(EqualNullSafe("l", null), Map.empty))
    assert(!run(EqualNullSafe("l", null), Map("l" -> 5L)))
    assert(run(EqualNullSafe("s", "abc"), Map("s" -> abc)))
    // NOT (l IN (5, NULL)): no true match → UNKNOWN → dropped, even for
    // a non-null l that differs from every literal (the NOT IN trap)
    assert(!run(Not(In("l", Array(5L, null))), Map("l" -> 7L)))
    assert(!run(Not(In("l", Array[Any](5L, null))), Map("l" -> 5L)))
    assert(run(Not(In("l", Array[Any](5L))), Map("l" -> 7L)))
    // Kleene OR under NOT: NOT(FALSE OR UNKNOWN) = UNKNOWN → dropped
    assert(!run(Not(Or(EqualTo("l", 5L), EqualTo("s", "x"))), Map("l" -> 7L)))
    // Kleene AND under NOT: NOT(FALSE AND UNKNOWN) = TRUE → kept
    assert(run(Not(And(EqualTo("l", 5L), EqualTo("s", "x"))), Map("l" -> 7L)))
    // suffix test pushes; null string under NOT stays UNKNOWN
    assert(run(StringEndsWith("s", "bc"), Map("s" -> abc)))
    assert(!run(Not(StringEndsWith("s", "bc")), Map.empty))
  }
}
