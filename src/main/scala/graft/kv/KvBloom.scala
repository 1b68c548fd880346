package graft.kv

import java.io.{File, FileInputStream, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.util.hashing.MurmurHash3

/** Per-shard bloom filters for point-predicate pruning — the axis zone
  * maps cannot cover: `EqualTo` on a HIGH-CARDINALITY, uniformly
  * distributed cell column has useless min/max bounds (every shard's
  * range covers every literal), but a per-shard bloom answers
  * "definitely absent" in one sidecar read.
  *
  * Layout decision for 100 TB: filters live in SIDECAR FILES
  * (`<shard>.bloom`, referenced by the manifest), not the manifest
  * itself — a useful filter needs ~10 bits per distinct value, which at
  * region scale is 100 KiB–1 MiB per shard and would bloat a 100k-shard
  * manifest by gigabytes the driver parses on every plan. Instead the
  * check runs EXECUTOR-SIDE, per task, before the shard file opens: the
  * task reads a KiB-scale sidecar and skips the multi-hundred-MiB shard
  * read on a definite miss (the same placement parquet uses for its
  * row-group blooms). Planning cost: zero driver bytes.
  *
  * Soundness: absence of a sidecar, a corrupt sidecar (CRC), an
  * untracked column, or any encode failure all degrade to "might
  * contain" — pruning can only skip, never invent, and a false positive
  * costs one ordinary shard scan. Tracked bytes are the raw CELL
  * encoding of non-null values; floats/doubles/decimals are never
  * tracked (`-0.0` and `0.0` are SQL-equal but encode differently — a
  * bloom keyed on bits would false-negative exactly there).
  *
  * File format: `GBF1 | k:int | mBits:int | nCols:int |
  * (nameLen:short name-utf8 words:mBits/64 longs)* | crc32c:int` over
  * everything before the CRC.
  */
object KvBloom {
  private val Magic = "GBF1".getBytes(StandardCharsets.US_ASCII)

  /** Types a bloom may track: value equality ≡ encoded-bytes equality. */
  def trackable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
          BooleanType | DateType | TimestampType => true
      case _ => false
    }
  }

  def sidecarName(shardFile: String): String = s"$shardFile.bloom"

  private def bit(words: Array[Long], mBits: Int, h1: Int, h2: Int, i: Int): Int =
    Math.floorMod(h1.toLong + i.toLong * h2.toLong, mBits.toLong).toInt

  final case class ShardBloom(mBits: Int, k: Int, cols: Map[String, Array[Long]]) {
    /** False only when NO tracked value of `col` can equal the bytes. */
    def mightContain(col: String, value: Array[Byte]): Boolean =
      cols.get(col) match {
        case None => true // untracked column: unknown
        case Some(words) =>
          val h1 = MurmurHash3.bytesHash(value, 0x9747b28c)
          val h2 = MurmurHash3.bytesHash(value, 0x85ebca6b)
          var i = 0
          var all = true
          while (all && i < k) {
            val b = bit(words, mBits, h1, h2, i)
            all = (words(b >>> 6) & (1L << (b & 63))) != 0L
            i += 1
          }
          all
      }
  }

  /** Mutable per-chunk accumulator (writer side). */
  final class Builder(requestedBits: Int, val k: Int, colKeys: Seq[String]) {
    val mBits: Int = ((requestedBits + 63) / 64) * 64
    private val cols: Map[String, Array[Long]] =
      colKeys.map(_ -> new Array[Long](mBits / 64)).toMap
    private var any = false

    def tracked(colKey: String): Boolean = cols.contains(colKey)

    def add(colKey: String, value: Array[Byte]): Unit = cols.get(colKey) match {
      case Some(words) =>
        val h1 = MurmurHash3.bytesHash(value, 0x9747b28c)
        val h2 = MurmurHash3.bytesHash(value, 0x85ebca6b)
        var i = 0
        while (i < k) {
          val b = bit(words, mBits, h1, h2, i)
          words(b >>> 6) |= 1L << (b & 63)
          i += 1
        }
        any = true
      case None => ()
    }

    def nonEmpty: Boolean = any
    def result(): ShardBloom = ShardBloom(mBits, k, cols.map { case (n, w) =>
      n -> java.util.Arrays.copyOf(w, w.length)
    })
    def reset(): Unit = { cols.values.foreach(java.util.Arrays.fill(_, 0L)); any = false }
  }

  def write(path: String, b: ShardBloom): Unit = {
    val names = b.cols.keys.toSeq.sorted
    val nameBytes = names.map(_.getBytes(StandardCharsets.UTF_8))
    val size = Magic.length + 12 +
      nameBytes.map(nb => 2 + nb.length + b.mBits / 8).sum + 4
    val buf = ByteBuffer.allocate(size)
    buf.put(Magic); buf.putInt(b.k); buf.putInt(b.mBits); buf.putInt(names.length)
    names.zip(nameBytes).foreach { case (n, nb) =>
      buf.putShort(nb.length.toShort); buf.put(nb)
      b.cols(n).foreach(buf.putLong)
    }
    val crc = new java.util.zip.CRC32C
    crc.update(buf.array(), 0, buf.position())
    buf.putInt(crc.getValue.toInt)
    val out = new FileOutputStream(path)
    try out.write(buf.array(), 0, buf.position()) finally out.close()
  }

  /** None on missing/corrupt/foreign-format sidecar — the sound fallback. */
  def read(path: String): Option[ShardBloom] =
    try {
      val f = new File(path)
      if (!f.exists()) return None
      val bytes = new Array[Byte](f.length().toInt)
      val in = new FileInputStream(f)
      try {
        var off = 0
        while (off < bytes.length) {
          val r = in.read(bytes, off, bytes.length - off)
          if (r < 0) return None
          off += r
        }
      } finally in.close()
      if (bytes.length < Magic.length + 16) return None
      val crc = new java.util.zip.CRC32C
      crc.update(bytes, 0, bytes.length - 4)
      val buf = ByteBuffer.wrap(bytes)
      val magic = new Array[Byte](Magic.length)
      buf.get(magic)
      if (!java.util.Arrays.equals(magic, Magic)) return None
      val k = buf.getInt; val mBits = buf.getInt; val n = buf.getInt
      if (k <= 0 || mBits <= 0 || mBits % 64 != 0 || n < 0) return None
      val cols = (0 until n).map { _ =>
        val nl = buf.getShort.toInt
        val nb = new Array[Byte](nl)
        buf.get(nb)
        val words = new Array[Long](mBits / 64)
        var i = 0
        while (i < words.length) { words(i) = buf.getLong; i += 1 }
        new String(nb, StandardCharsets.UTF_8) -> words
      }.toMap
      if (buf.getInt != crc.getValue.toInt) return None
      Some(ShardBloom(mBits, k, cols))
    } catch { case _: Exception => None }

  /** Bit-union for compaction: defined only when every input shares
    * (mBits, k) and the column set — None otherwise (merged shard goes
    * bloom-less, which is sound). */
  def union(bs: Seq[ShardBloom]): Option[ShardBloom] = bs match {
    case Nil => None
    case head +: rest =>
      if (!rest.forall(b => b.mBits == head.mBits && b.k == head.k &&
            b.cols.keySet == head.cols.keySet)) None
      else Some(ShardBloom(head.mBits, head.k, head.cols.map { case (n, w) =>
        val acc = java.util.Arrays.copyOf(w, w.length)
        rest.foreach { b =>
          val o = b.cols(n)
          var i = 0
          while (i < acc.length) { acc(i) |= o(i); i += 1 }
        }
        n -> acc
      }))
  }
}
