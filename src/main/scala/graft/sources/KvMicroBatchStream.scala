package graft.sources

import graft.kv.KvStore
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over a KV table (SURVEY.md §7 stretch — the
  * reference declares spark-streaming as a dependency but never uses it,
  * `HbaseTable.scala:21` excludes streaming capabilities).
  *
  * The shard manifest is APPEND-ONLY under `mode("append")` writes, so
  * the stream offset is simply the number of manifest entries consumed;
  * each micro-batch reads the shard files that appeared since the last
  * offset — the same contract as Spark's file source, minus the
  * directory listing (the manifest is the listing). Overwrite/truncate
  * resets the manifest and is NOT a valid source for a running stream.
  *
  * Pushed filters and column pruning apply per micro-batch exactly as
  * in batch scans (same reader factory).
  */
case class KvOffset(shardCount: Int) extends Offset {
  override def json(): String = s"""{"shardCount":$shardCount}"""
}

class KvMicroBatchStream(dir: String, rowkeyName: String,
                         prunedSchema: StructType, declared: StructType,
                         filters: Array[Filter], columnar: Boolean = true)
    extends MicroBatchStream {

  /** Missing manifest = table not yet written → empty offset (the file
    * source tolerates an initially empty directory the same way). */
  private def shardCount(): Int =
    if (new java.io.File(KvStore.metaPath(dir)).exists())
      KvStore.readMeta(dir).shards.length
    else 0

  override def latestOffset(): Offset = KvOffset(shardCount())

  override def initialOffset(): Offset = KvOffset(0)

  override def deserializeOffset(json: String): Offset =
    KvOffset("\"shardCount\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(s"bad KvOffset json: $json")))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KvOffset].shardCount
    val e = end.asInstanceOf[KvOffset].shardCount
    if (e == 0) Array.empty
    else {
      // the OFFSET is the manifest position (s until e); rowkey ranges
      // and zone maps then drop newly-appeared shards that could not
      // hold a matching row — rows in them could never survive the
      // per-record filter, so skipping the file read is observationally
      // identical. Surviving shards carry their clip ranges, so gap
      // records inside a kept shard skip cell parsing too (same
      // machinery as the batch scan).
      val slice = KvStore.readMeta(dir).shards.slice(s, e)
      val dt = declared.find(_.name == rowkeyName).map(_.dataType)
      val ranges = dt.map(KeyRanges.fromFilters(filters, rowkeyName, _))
        .getOrElse(KeyRanges.Full)
      val inRange = slice.filter(sh =>
        KeyRanges.intersectsShard(ranges, sh.minKey, sh.maxKey))
      KvZoneMaps.prune(inRange, filters, declared)
        .map { sh =>
          val local = KeyRanges.clipToShard(ranges, sh.minKey, sh.maxKey)
            .map { case (lo, hi) => (lo.map(KvStore.toHex), hi.map(KvStore.toHex)) }
          KvInputPartition(sh, local): InputPartition
        }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KvPartitionReaderFactory(dir, prunedSchema.json, declared.json,
      rowkeyName, filters, -1, reverse = false, columnar = columnar)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
