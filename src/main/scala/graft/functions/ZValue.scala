package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values from Spark builtin expressions — the
  * clustering key behind `CALL graft.system.zorder(...)`.
  *
  * Each participating column is reduced to a 16-bit LANE:
  *
  *  - numeric / date / timestamp columns range-normalize against the
  *    corpus [min, max] (computed by the caller in one tiny aggregate),
  *    so nearby values share high bits — true multi-dimensional
  *    locality;
  *  - string (and other unrangeable) columns hash into the lane with
  *    xxhash64 — no range locality, but equal values still co-cluster,
  *    which is what point-predicate pruning needs.
  *
  * Lanes are then bit-interleaved round-robin (lane j's bit i lands at
  * z-bit `i*n + j`), giving every dimension equal weight in the shard
  * sort order. The whole construction is ~16·n builtin
  * shift/and/or terms — no UDF, stays inside WholeStageCodegen, and
  * distributes like any other projection.
  *
  * Why this matters at 100 TB: the KV writer range-partitions on this
  * value and each shard records zone-map min/max for EVERY column, so
  * after a z-order rewrite a predicate on ANY interleaved dimension
  * prunes most shards — the same trick Delta/Iceberg OPTIMIZE ZORDER
  * plays with parquet file stats, rebuilt here over shard zone maps.
  */
object ZValue {

  val LaneBits = 16

  /** Range-normalized 16-bit lane for a numeric-ish column. Nulls sort
    * first (lane 0). A constant column (max <= min) contributes lane 0
    * everywhere — it degrades to a no-op dimension, never a crash. */
  def numericLane(c: Column, min: Double, max: Double): Column =
    if (!(max > min)) lit(0L)
    else {
      val scaled = (c.cast("double") - lit(min)) / lit(max - min) * lit(65535.0)
      coalesce(least(greatest(round(scaled, 0).cast("long"), lit(0L)), lit(65535L)), lit(0L))
    }

  /** Hash lane for string/unrangeable columns: equal values co-cluster. */
  def hashLane(c: Column): Column =
    coalesce(xxhash64(c).bitwiseAND(lit(0xFFFFL)), lit(0L))

  /** Round-robin bit interleave of n 16-bit lanes into one long. */
  def interleave(lanes: Seq[Column]): Column = {
    require(lanes.nonEmpty, "z-order needs at least one column")
    require(lanes.size * LaneBits <= 63, s"too many z-order columns (max ${63 / LaneBits})")
    val n = lanes.size
    lanes.zipWithIndex.flatMap { case (lane, j) =>
      (0 until LaneBits).map { i =>
        shiftleft(shiftright(lane, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_.bitwiseOR(_))
  }
}
