package graft.kv

import org.apache.spark.sql.types.DataType

/** The ONE bucket hash every component shares. Three call sites must
  * agree byte-for-byte or a storage-partitioned join silently co-locates
  * the wrong rows:
  *
  *  1. the writer ([[graft.sources.KvDataWriter]]) tags each shard with
  *     the bucket of the keys it holds,
  *  2. the scan ([[graft.sources.KvScan]]) reports those tags as
  *     `KeyGroupedPartitioning` partition keys, and
  *  3. the SQL `bucket(n, col)` function the catalog exports
  *     ([[graft.sources.KvBucketFunction]]), which Spark binds into the
  *     reported transform and may evaluate itself (e.g. when padding
  *     missing partitions on one join side).
  *
  * The hash runs over the ORDER-PRESERVING key encoding
  * ([[BytesCodec.encodeKey]]), not the raw value: the writer already has
  * the encoded key in hand on its hot path, and encoding first makes the
  * function total over every rowkey-legal type with no per-type cases.
  * FNV-1a 64 is used for its unconditional per-byte simplicity; bucket
  * quality only needs "spreads region-count keys evenly", not
  * cryptographic strength.
  */
object KvBuckets {

  /** FNV-1a 64-bit over the encoded key, folded to [0, n). */
  def ofKey(encodedKey: Array[Byte], n: Int): Int = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < encodedKey.length) {
      h ^= (encodedKey(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // fold the high half in before the modulo so the bucket id sees all
    // 64 bits, then floorMod for a non-negative result
    java.lang.Math.floorMod(h ^ (h >>> 32), n.toLong).toInt
  }

  /** Bucket of a rowkey VALUE in catalyst representation (what the SQL
    * `bucket()` function and tests evaluate). */
  def ofValue(dt: DataType, value: Any, n: Int): Int =
    ofKey(BytesCodec.encodeKey(dt, value), n)
}
