package graft.sources

import graft.kv.{KvBloom, KvCatalog, KvShardMeta}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Executor-side bloom check, run by the reader factory BEFORE a shard
  * file opens: if any pushed conjunct is provably unsatisfiable against
  * the shard's bloom sidecar, the task reads a KiB-scale sidecar
  * instead of the shard — the point-predicate complement to the
  * driver-side zone-map pruning ([[KvZoneMaps]]), for columns whose
  * min/max bounds are useless (high-cardinality, uniform).
  *
  * Sound by construction: only a definite ALL-hash-miss skips; missing/
  * corrupt sidecars, untracked columns, un-encodable literals, and
  * every non-equality shape keep the shard. `Not`/`Or` trees never
  * prune (an `Or` may match through its other branch; a `Not` matches
  * exactly where the inner misses). */
object KvBloomPrune {

  /** Encode a pushed literal in the raw CELL encoding — the bytes the
    * writer fed the bloom. None = cannot encode = cannot prune. */
  private def enc(dt: DataType, v: Any): Option[Array[Byte]] = {
    val c = FilterEval.canon(dt, v)
    try Some(graft.kv.BytesCodec.encode(dt, (dt, c) match {
      case (_, s: String) => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case (LongType, n: Number) => n.longValue()
      case (IntegerType, n: Number) => n.intValue()
      case (ShortType, n: Number) => n.shortValue()
      case (ByteType, n: Number) => n.byteValue()
      case (_, other) => other
    })) catch { case _: Exception => None }
  }

  /** True iff the shard could hold a row satisfying every conjunct. */
  def canMatch(dir: String, shard: KvShardMeta, filters: Array[Filter],
               declared: StructType): Boolean = {
    if (shard.bloom.isEmpty || filters.isEmpty) return true
    // the sidecar is read at most once, and only when a conjunct is
    // actually bloom-answerable
    lazy val bloom: Option[KvBloom.ShardBloom] =
      KvBloom.read(s"$dir/${shard.bloom}")
    val byName = declared.fields.map(f => f.name -> f).toMap

    def absent(a: String, v: Any): Boolean =
      byName.get(a).exists { fld =>
        v != null &&
        fld.metadata.getString("columnFamily") != KvCatalog.RowkeyCf &&
        KvBloom.trackable(fld.dataType) && {
          val key = s"${fld.metadata.getString("columnFamily")}:${fld.metadata.getString("column")}"
          enc(fld.dataType, v).exists(bytes =>
            bloom.exists(b => b.cols.contains(key) && !b.mightContain(key, bytes)))
        }
      }

    def impossible(f: Filter): Boolean = f match {
      case EqualTo(a, v) => absent(a, v)
      // <=> non-null literal matches only that value; <=> NULL matches
      // the missing cell — blooms know nothing about absence
      case EqualNullSafe(a, v) if v != null => absent(a, v)
      case In(a, vs) if vs.nonEmpty =>
        // unsatisfiable only if EVERY literal is definitely absent
        vs.forall(v => absent(a, v))
      case And(l, r) => impossible(l) || impossible(r)
      case _ => false
    }

    !filters.exists(impossible)
  }
}
