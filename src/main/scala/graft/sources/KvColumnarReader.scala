package graft.sources

import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** Vectorized KV read path: decodes shard records into reused on-heap
  * column vectors, `capacity` rows per [[ColumnarBatch]].
  *
  * The reference reads row-at-a-time through the HBase client
  * (`HbasePartitionReader.scala` — one `Result` per `next()`); a Spark
  * rebuild can do better because downstream operators consume batches
  * through codegen'd `ColumnarToRow`, so full-shard scans avoid one
  * `InternalRow` allocation per record and keep the decode loop tight.
  * Behind the `columnar` option (default on); forward scans over flat
  * schemas only — the DESC-tail ring buffer and nested array/map columns
  * stay on the row reader ([[KvPartitionReader]]).
  */
object KvColumnarReader {
  val DefaultCapacity = 4096

  /** Columnar-eligible = every projected column has a vector writer
    * below. Nested types (array/map) and calendar-interval fall back to
    * the row path. */
  def eligible(pruned: StructType): Boolean = pruned.fields.forall { f =>
    f.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | DateType | TimestampType |
          StringType | BinaryType => true
      case d: DecimalType if d.precision <= 18 => true
      case _ => false
    }
  }

  /** One writer per column, resolved once: (vector, slot, decoded
    * internal value) → vector write. Values arrive in Catalyst-internal
    * form (UTF8String / days-int / micros-long / Decimal) from
    * [[graft.kv.BytesCodec.decode]]. */
  private[sources] def writerFor(dt: DataType): (WritableColumnVector, Int, Any) => Unit =
    dt match {
      case BooleanType => (v, i, x) => v.putBoolean(i, x.asInstanceOf[Boolean])
      case ByteType    => (v, i, x) => v.putByte(i, x.asInstanceOf[Byte])
      case ShortType   => (v, i, x) => v.putShort(i, x.asInstanceOf[Short])
      case IntegerType | DateType => (v, i, x) => v.putInt(i, x.asInstanceOf[Int])
      case LongType | TimestampType => (v, i, x) => v.putLong(i, x.asInstanceOf[Long])
      case FloatType   => (v, i, x) => v.putFloat(i, x.asInstanceOf[Float])
      case DoubleType  => (v, i, x) => v.putDouble(i, x.asInstanceOf[Double])
      case StringType  => (v, i, x) => {
        val b = x.asInstanceOf[UTF8String].getBytes
        v.putByteArray(i, b, 0, b.length)
      }
      case BinaryType  => (v, i, x) => {
        val b = x.asInstanceOf[Array[Byte]]
        v.putByteArray(i, b, 0, b.length)
      }
      case d: DecimalType =>
        (v, i, x) => v.putDecimal(i, x.asInstanceOf[Decimal], d.precision)
      case other => throw new IllegalArgumentException(
        s"not columnar-eligible: $other") // guarded by eligible()
    }
}

class KvColumnarReader(dir: String, part: KvInputPartition,
                       pruned: StructType, declared: StructType,
                       rowkeyName: String, filters: Array[Filter], limit: Int,
                       capacity: Int = KvColumnarReader.DefaultCapacity)
    extends org.apache.spark.sql.connector.read.PartitionReader[ColumnarBatch] {

  // same needed-column resolution as the row reader: pruned ∪ filter refs
  private val decoder = new KvRecordDecoder(declared,
    pruned.fieldNames.toSet ++ filters.flatMap(_.references))
  private val reader = new graft.kv.KvStore.ShardReader(dir, part.shard,
    wanted = decoder.wantedCell, ranges = part.decodedRanges)
  private val prunedFromNeeded: Array[Int] = pruned.fieldNames.map(decoder.idxByName)
  private val writers = pruned.fields.map(f => KvColumnarReader.writerFor(f.dataType))
  private val pred = FilterEval.compile(filters, decoder.idxByName, decoder.dtByName,
    decoder.scratch)

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(capacity, pruned)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
  private var served = 0L
  private var recordsRead = 0L // pre-filter: every record decoded

  override def next(): Boolean = {
    if (limit >= 0 && served >= limit) return false
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    while (n < capacity && (limit < 0 || served < limit) && reader.hasNext) {
      decoder.decodeInto(reader.next())
      recordsRead += 1
      if (pred()) {
        var k = 0
        while (k < writers.length) {
          val x = decoder.scratch(prunedFromNeeded(k))
          if (x == null) vectors(k).putNull(n) else writers(k)(vectors(k), n, x)
          k += 1
        }
        n += 1
        served += 1
      }
    }
    if (n == 0) false
    else { batch.setNumRows(n); true }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    reader.close()
    batch.close()
  }

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = Array(
    KvScanMetrics.taskMetric("kvRecordsRead", recordsRead),
    KvScanMetrics.taskMetric("kvBytesRead", reader.bytesRead))
}
