package graft.sources

import graft.kv.{BytesCodec, KvStore}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Disjoint-rowkey-range planning: compiles the pushed conjuncts into a
  * NORMALIZED union of inclusive key ranges instead of one [min,max]
  * envelope. `id IN (1, 5, 999999)` used to scan nearly the whole
  * keyspace (the envelope covers every shard between the extremes —
  * SURVEY.md noted this as the reference's own canonical access pattern
  * done poorly); here each literal is its own point range, shards
  * outside every range are pruned at plan time, and the shard reader
  * skips cell parsing for records that fall in the gaps BETWEEN ranges.
  *
  * Representation: `(Option[lo], Option[hi])`, both INCLUSIVE in the
  * order-preserving key encoding; `None` = unbounded. A normalized set
  * is sorted by lo, pairwise disjoint, and empty-range free; the empty
  * SET means "matches nothing" (e.g. `rowkey <=> NULL` — the rowkey is
  * never null) and plans zero partitions. Bounds are SOUND, not tight:
  * strict comparisons keep their boundary key in range and the
  * per-record predicate drops it, exactly like the single-span planner
  * this replaces.
  */
object KeyRanges {
  type Bound = Option[Array[Byte]]
  type Range = (Bound, Bound)

  /** The unconstrained set (every key). */
  val Full: Seq[Range] = Seq((None, None))

  /** Beyond this many disjoint ranges the set collapses to its envelope
    * — bounds task/manifest serialization and per-shard intersection
    * for degenerate 100k-literal INs. */
  val MaxRanges = 4096

  private def cmpLo(a: Bound, b: Bound): Int = (a, b) match {
    case (None, None) => 0
    case (None, _) => -1
    case (_, None) => 1
    case (Some(x), Some(y)) => BytesCodec.compareKeys(x, y)
  }
  private def cmpHi(a: Bound, b: Bound): Int = (a, b) match {
    case (None, None) => 0
    case (None, _) => 1
    case (_, None) => -1
    case (Some(x), Some(y)) => BytesCodec.compareKeys(x, y)
  }
  private def nonEmpty(r: Range): Boolean = (r._1, r._2) match {
    case (Some(l), Some(h)) => BytesCodec.compareKeys(l, h) <= 0
    case _ => true
  }
  private def maxLo(a: Bound, b: Bound): Bound = if (cmpLo(a, b) >= 0) a else b
  private def minHi(a: Bound, b: Bound): Bound = if (cmpHi(a, b) <= 0) a else b

  /** Sort by lo, drop empties, merge overlaps → disjoint sorted set. */
  def normalize(rs: Seq[Range]): Seq[Range] = {
    val live = rs.filter(nonEmpty).sortWith((a, b) => cmpLo(a._1, b._1) < 0)
    if (live.length <= 1) return live
    val out = scala.collection.mutable.ArrayBuffer[Range](live.head)
    live.tail.foreach { r =>
      val (clo, chi) = out.last
      // overlap iff r.lo <= current.hi (inclusive bounds; byte-adjacent
      // but non-overlapping point ranges stay separate — disjointness is
      // all the reader's cursor needs)
      val overlaps = (chi, r._1) match {
        case (None, _) => true
        case (_, None) => true // sorted ⇒ r.lo None only if current.lo None too
        case (Some(h), Some(l)) => BytesCodec.compareKeys(l, h) <= 0
      }
      if (overlaps) out(out.length - 1) = (clo, if (cmpHi(chi, r._2) >= 0) chi else r._2)
      else out += r
    }
    out.toSeq
  }

  /** Collapse an oversized normalized set to its envelope (sound
    * superset; in a disjoint set sorted by lo the his increase too, so
    * (first.lo, last.hi) covers everything). Applied at EVERY combine
    * step of the filter fold, not just at the end — two ~MaxRanges
    * inputs (a 10k-literal static IN conjoined with a large runtime DPP
    * IN-set) would otherwise do O(n·m) pairwise allocations on the
    * driver before any cap could fire. */
  private def clamp(rs: Seq[Range]): Seq[Range] =
    if (rs.length > MaxRanges) Seq((rs.head._1, rs.last._2)) else rs

  /** Intersection of two normalized sets (result normalized). A linear
    * merge sweep, not pairwise O(n·m): both inputs are sorted and
    * disjoint, so at each step only the current pair can overlap, and
    * the side whose hi ends first advances (its range can't intersect
    * anything later on the other side). Inputs are re-normalized
    * defensively (idempotent, O(n log n)) so a non-normalized caller
    * can't silently get wrong answers. */
  def intersect(a: Seq[Range], b: Seq[Range]): Seq[Range] = {
    val aa = normalize(a).toIndexedSeq
    val bb = normalize(b).toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer[Range]()
    var i = 0
    var j = 0
    while (i < aa.length && j < bb.length) {
      val r = (maxLo(aa(i)._1, bb(j)._1), minHi(aa(i)._2, bb(j)._2))
      if (nonEmpty(r)) out += r
      if (cmpHi(aa(i)._2, bb(j)._2) <= 0) i += 1 else j += 1
    }
    out.toSeq // sweep output is already sorted and disjoint
  }

  def union(a: Seq[Range], b: Seq[Range]): Seq[Range] = normalize(a ++ b)

  /** Encode a literal for the rowkey's declared type; None = the
    * literal doesn't canonicalize (no constraint taken from it). */
  private def enc(dt: DataType, v: Any): Option[Array[Byte]] = {
    val c = FilterEval.canon(dt, v)
    try Some(BytesCodec.encodeKey(dt, (dt, c) match {
      case (_, s: String) => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case (LongType, n: Number) => n.longValue()
      case (IntegerType, n: Number) => n.intValue()
      case (ShortType, n: Number) => n.shortValue()
      case (ByteType, n: Number) => n.byteValue()
      case (DoubleType, n: Number) => n.doubleValue()
      case (FloatType, n: Number) => n.floatValue()
      case (_, other) => other
    })) catch { case _: Exception => None }
  }

  /** Compile the pushed conjuncts to a normalized range set. Each
    * conjunct compiles recursively (And = intersect, Or = union — an Or
    * branch that doesn't constrain the rowkey makes the whole Or
    * unconstrained); conjuncts that yield no constraint contribute
    * [[Full]]. */
  def fromFilters(filters: Array[Filter], rowkeyName: String,
                  dt: DataType): Seq[Range] = {
    def point(v: Any): Option[Seq[Range]] = enc(dt, v).map(b => Seq((Some(b), Some(b))))
    def of(f: Filter): Option[Seq[Range]] = f match {
      case EqualTo(a, v) if a == rowkeyName => point(v)
      // the rowkey is never null: <=> NULL matches nothing, <=> v is
      // plain equality (same reasoning as the single-span planner)
      case EqualNullSafe(a, v) if a == rowkeyName =>
        if (v == null) Some(Nil) else point(v)
      case IsNull(a) if a == rowkeyName => Some(Nil)
      case GreaterThan(a, v) if a == rowkeyName =>
        enc(dt, v).map(b => Seq((Some(b), None)))
      case GreaterThanOrEqual(a, v) if a == rowkeyName =>
        enc(dt, v).map(b => Seq((Some(b), None)))
      case LessThan(a, v) if a == rowkeyName =>
        enc(dt, v).map(b => Seq((None, Some(b))))
      case LessThanOrEqual(a, v) if a == rowkeyName =>
        enc(dt, v).map(b => Seq((None, Some(b))))
      case In(a, vs) if a == rowkeyName && vs.nonEmpty =>
        val encs = vs.toSeq.map(enc(dt, _))
        // constraining only if EVERY literal encodes — a missed literal
        // could match outside the encoded points
        if (encs.forall(_.isDefined))
          Some(clamp(normalize(encs.map(b => (b, b)))))
        else None
      // prefix seek: keys with prefix p live in [p, successor(p)); the
      // successor is kept INCLUSIVE (sound, one extra key possible —
      // the per-record StartsWith drops it); no successor = unbounded
      case StringStartsWith(a, p) if a == rowkeyName && dt == StringType && p.nonEmpty =>
        val pb = org.apache.spark.unsafe.types.UTF8String.fromString(p).getBytes
        Some(Seq((Some(pb), BytesCodec.prefixSuccessor(pb))))
      case And(l, r) => (of(l), of(r)) match {
        case (Some(x), Some(y)) => Some(clamp(intersect(x, y)))
        case (x, y) => x.orElse(y)
      }
      case Or(l, r) => for { x <- of(l); y <- of(r) } yield clamp(union(x, y))
      case _ => None
    }
    filters.foldLeft(Full) { (acc, f) =>
      of(f).map(s => clamp(intersect(acc, s))).getOrElse(acc)
    }
  }

  /** Does any range intersect the shard's [minKey, maxKey]? Binary
    * search on the sorted set — O(log n) per shard, so a 100k-shard
    * manifest against a 4096-range IN stays cheap at plan time. */
  def intersectsShard(ranges: Seq[Range], minKey: Array[Byte],
                      maxKey: Array[Byte]): Boolean = {
    if (ranges.isEmpty) return false
    // rightmost range with lo <= maxKey: in a disjoint sorted set the
    // his are increasing too, so that candidate has the largest hi among
    // eligible ranges — it intersects iff its hi >= minKey
    var lo = 0
    var hi = ranges.length - 1
    var cand = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cmpLo(ranges(mid)._1, Some(maxKey)) <= 0) { cand = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    cand >= 0 && cmpHi(ranges(cand)._2, Some(minKey)) >= 0
  }

  /** The planned keys when EVERY range is a single point (`=` / `IN`
    * lookups); None as soon as any range spans more than one key — a
    * span can hash to any bucket, so point-only is the exact condition
    * under which bucket pruning is sound. */
  def pointKeys(ranges: Seq[Range]): Option[Seq[Array[Byte]]] = {
    val pts = ranges.collect {
      case (Some(l), Some(h)) if BytesCodec.compareKeys(l, h) == 0 => l
    }
    if (pts.length == ranges.length) Some(pts) else None
  }

  /** The subset of ranges intersecting the shard (contiguous in the
    * sorted set) — what the shard's reader cursor walks. */
  def clipToShard(ranges: Seq[Range], minKey: Array[Byte],
                  maxKey: Array[Byte]): Seq[Range] =
    ranges.filter(r => cmpLo(r._1, Some(maxKey)) <= 0 && cmpHi(r._2, Some(minKey)) >= 0)

  /** Is `key` inside any range? A point is a degenerate shard. */
  def containsKey(ranges: Seq[Range], key: Array[Byte]): Boolean =
    intersectsShard(ranges, key, key)

  /** Is the shard's [minKey, maxKey] FULLY inside one range? (Ranges
    * are disjoint, a shard is contiguous — so full coverage means a
    * single range contains both ends.) The fast path that lets a range
    * replace drop interior shards without reading them. */
  def coversShard(ranges: Seq[Range], minKey: Array[Byte],
                  maxKey: Array[Byte]): Boolean =
    ranges.exists(r =>
      cmpLo(r._1, Some(minKey)) <= 0 && cmpHi(r._2, Some(maxKey)) >= 0)

  /** Serialize a BOUNDED normalized set as `lohex:hihex[,...]` — the
    * wire form of the writer's `replaceKeyRanges` option (bounds are
    * the order-preserving [[graft.kv.BytesCodec]] key encoding, both
    * inclusive). Unbounded ranges are refused: a range replace must
    * state exactly what it replaces. */
  def serializeBounded(rs: Seq[Range]): String = {
    val norm = normalize(rs)
    require(norm.nonEmpty, "replaceKeyRanges: empty range set")
    norm.map {
      case (Some(l), Some(h)) => s"${KvStore.toHex(l)}:${KvStore.toHex(h)}"
      case r => throw new IllegalArgumentException(
        s"replaceKeyRanges requires bounded ranges, got ${describe(Seq(r))}")
    }.mkString(",")
  }

  /** Typed convenience for [[serializeBounded]]: encode `(lo, hi)`
    * value pairs (both inclusive) with the rowkey's declared type. */
  def serializeTyped(dt: DataType, ranges: Seq[(Any, Any)]): String =
    serializeBounded(ranges.map { case (lo, hi) =>
      (Some(BytesCodec.encodeKey(dt, lo)): Bound,
        Some(BytesCodec.encodeKey(dt, hi)): Bound)
    })

  /** Parse [[serializeBounded]]'s form back to a normalized set. */
  def parseBounded(s: String): Seq[Range] = {
    val rs = s.split(",").toSeq.map { part =>
      part.split(":") match {
        case Array(lo, hi) =>
          (Some(KvStore.fromHex(lo)): Bound, Some(KvStore.fromHex(hi)): Bound)
        case _ => throw new IllegalArgumentException(
          s"replaceKeyRanges: malformed range '$part' (want lohex:hihex)")
      }
    }
    val norm = normalize(rs)
    require(norm.nonEmpty, s"replaceKeyRanges: no non-empty ranges in '$s'")
    norm
  }

  private def describe(rs: Seq[Range]): String =
    rs.map { case (l, h) =>
      s"[${l.map(KvStore.toHex).getOrElse("-inf")}, " +
        s"${h.map(KvStore.toHex).getOrElse("+inf")}]"
    }.mkString(", ")
}
