package graft.sources

import graft.kv.BytesCodec
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Algebra tests for [[KeyRanges]]: the multi-range planner must agree
  * exactly with brute-force predicate evaluation over a dense key
  * domain — a false "outside every range" would silently drop rows at
  * plan time, the one bug class a pruning layer cannot have. */
class KeyRangesSpec extends AnyFunSuite {

  private val rk = "k"
  private def ranges(fs: Filter*): Seq[KeyRanges.Range] =
    KeyRanges.fromFilters(fs.toArray, rk, LongType)

  /** Is `v` inside any planned range? (inclusive bounds, key encoding) */
  private def covered(rs: Seq[KeyRanges.Range], v: Long): Boolean = {
    val b = BytesCodec.encodeKey(LongType, v)
    rs.exists { case (lo, hi) =>
      lo.forall(l => BytesCodec.compareKeys(b, l) >= 0) &&
      hi.forall(h => BytesCodec.compareKeys(b, h) <= 0)
    }
  }

  /** Three-valued-free reference eval on a never-null rowkey. */
  private def eval(f: Filter, v: Long): Boolean = f match {
    case EqualTo(_, x) => v == x.asInstanceOf[Number].longValue()
    case EqualNullSafe(_, x) => x != null && v == x.asInstanceOf[Number].longValue()
    case GreaterThan(_, x) => v > x.asInstanceOf[Number].longValue()
    case GreaterThanOrEqual(_, x) => v >= x.asInstanceOf[Number].longValue()
    case LessThan(_, x) => v < x.asInstanceOf[Number].longValue()
    case LessThanOrEqual(_, x) => v <= x.asInstanceOf[Number].longValue()
    case In(_, vs) => vs.exists(x => v == x.asInstanceOf[Number].longValue())
    case IsNull(_) => false
    case And(l, r) => eval(l, v) && eval(r, v)
    case Or(l, r) => eval(l, v) || eval(r, v)
    case _ => true
  }

  test("IN plans one point range per literal, sorted and deduped") {
    val rs = ranges(In(rk, Array(5L, 999999L, 1L, 5L)))
    assert(rs.length == 3)
    assert(rs.forall { case (lo, hi) => lo.isDefined && hi.isDefined &&
      java.util.Arrays.equals(lo.get, hi.get) })
    assert(covered(rs, 1L) && covered(rs, 5L) && covered(rs, 999999L))
    assert(!covered(rs, 2L) && !covered(rs, 500000L))
  }

  test("Or of IN and a band unions to disjoint ranges") {
    val rs = ranges(Or(In(rk, Array(1L, 1000000L)),
      And(GreaterThanOrEqual(rk, 100L), LessThanOrEqual(rk, 200L))))
    assert(rs.length == 3)
    assert(covered(rs, 150L) && covered(rs, 1L) && !covered(rs, 50L))
  }

  test("conjuncts intersect: IN clipped by a range keeps only inside points") {
    val rs = ranges(In(rk, Array(1L, 150L, 1000000L)), GreaterThan(rk, 100L),
      LessThan(rk, 2000L))
    // bounds are sound-not-tight: strict comparisons keep the boundary
    assert(covered(rs, 150L) && !covered(rs, 1L) && !covered(rs, 1000000L))
  }

  test("rowkey <=> NULL and IS NULL plan the empty set (rowkey never null)") {
    assert(ranges(EqualNullSafe(rk, null)).isEmpty)
    assert(ranges(IsNull(rk)).isEmpty)
    assert(ranges(Or(EqualNullSafe(rk, null), EqualTo(rk, 7L))).length == 1)
  }

  test("an Or branch not constraining the rowkey makes the Or unconstrained") {
    assert(ranges(Or(EqualTo(rk, 5L), EqualTo("other", 1L))) == KeyRanges.Full)
  }

  test("beyond MaxRanges the set collapses to its envelope") {
    val many = (0 until KeyRanges.MaxRanges + 10).map(i => (i * 10).toLong)
    val rs = ranges(In(rk, many.toArray[Any]))
    assert(rs.length == 1)
    assert(covered(rs, 0L) && covered(rs, many.last) && covered(rs, 5L),
      "envelope must be a sound superset")
  }

  test("two near-cap INs conjoin without quadratic pairwise work (intermediate clamp)") {
    // each IN is just under MaxRanges; their conjunction used to do
    // O(n·m) ≈ 16M pairwise intersect allocations before the final cap.
    // With the per-step clamp this completes fast and stays sound.
    val n = KeyRanges.MaxRanges - 1
    val a = (0 until n).map(i => (i * 10).toLong)          // 0, 10, 20, ...
    val b = (0 until n).map(i => (i * 10 + 5000).toLong)   // offset grid
    val t0 = System.nanoTime()
    val rs = ranges(In(rk, a.toArray[Any]), In(rk, b.toArray[Any]))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 5.0, f"conjoining two ~MaxRanges INs took $sec%.1fs — clamp regressed")
    assert(rs.length <= KeyRanges.MaxRanges)
    // soundness: every key in BOTH grids must stay covered
    val both = a.toSet.intersect(b.toSet)
    both.take(50).foreach(v => assert(covered(rs, v), s"common key $v lost"))
  }

  test("randomized: planned coverage ⊇ filter truth over a dense domain") {
    val rnd = new scala.util.Random(42)
    def leaf(): Filter = rnd.nextInt(6) match {
      case 0 => EqualTo(rk, rnd.nextInt(100).toLong)
      case 1 => GreaterThan(rk, rnd.nextInt(100).toLong)
      case 2 => LessThanOrEqual(rk, rnd.nextInt(100).toLong)
      case 3 => In(rk, Array.fill(1 + rnd.nextInt(5))(rnd.nextInt(100).toLong: Any))
      case 4 => GreaterThanOrEqual(rk, rnd.nextInt(100).toLong)
      case _ => LessThan(rk, rnd.nextInt(100).toLong)
    }
    def tree(depth: Int): Filter =
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => And(tree(depth - 1), tree(depth - 1))
        case 1 => Or(tree(depth - 1), tree(depth - 1))
        case _ => leaf()
      }
    (1 to 500).foreach { _ =>
      val fs = Array.fill(1 + rnd.nextInt(2))(tree(2))
      val rs = KeyRanges.fromFilters(fs, rk, LongType)
      // normalized: sorted + disjoint
      rs.sliding(2).foreach {
        case Seq((_, Some(h)), (Some(l), _)) =>
          assert(BytesCodec.compareKeys(h, l) < 0, s"overlap in $rs for ${fs.toSeq}")
        case _ => ()
      }
      (-5L to 105L).foreach { v =>
        val truth = fs.forall(eval(_, v))
        if (truth) assert(covered(rs, v),
          s"key $v matches ${fs.toSeq} but is outside planned ranges")
      }
    }
  }
}
