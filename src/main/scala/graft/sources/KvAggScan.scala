package graft.sources

import graft.kv._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._

/** Aggregate pushdown (SURVEY.md §2.4 stretch — `SupportsPushDownAggregates`,
  * absent in the reference): global COUNT(*) / COUNT(col) / MIN / MAX
  * run inside the scan. Each partition emits ONE partial row; Spark's
  * final aggregate merges them. COUNT(*) with no residual predicates is
  * answered from the shard manifest without opening a single shard file.
  */
sealed trait KvAggSpec extends Serializable
case object KvCountStar extends KvAggSpec
final case class KvCountCol(name: String) extends KvAggSpec
final case class KvMinCol(name: String) extends KvAggSpec
final case class KvMaxCol(name: String) extends KvAggSpec

object KvAggSpec {
  private def fieldName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case f: NamedReference if f.fieldNames().length == 1 => Some(f.fieldNames()(0))
      case _ => None
    }

  /** Translate a connector Aggregation (global, no group-by) into specs;
    * None → not pushable. MIN/MAX additionally require an orderable
    * declared type — claiming a decimal/binary/array column and then
    * failing executor-side would break a query Spark could run itself. */
  def translate(agg: Aggregation, declared: StructType): Option[Seq[KvAggSpec]] = {
    if (agg.groupByExpressions().nonEmpty) return None
    val names = declared.fieldNames.toSet
    val orderable: Set[String] = declared.fields
      .filter(f => FilterEval.comparable(f.dataType)).map(_.name).toSet
    val specs = agg.aggregateExpressions().map {
      case _: CountStar => KvCountStar
      case c: Count if !c.isDistinct =>
        fieldName(c.column()).filter(names).map(KvCountCol.apply).getOrElse(return None)
      case m: Min =>
        fieldName(m.column()).filter(orderable).map(KvMinCol.apply).getOrElse(return None)
      case m: Max =>
        fieldName(m.column()).filter(orderable).map(KvMaxCol.apply).getOrElse(return None)
      case _ => return None
    }
    Some(specs.toIndexedSeq)
  }

  def outputSchema(specs: Seq[KvAggSpec], declared: StructType): StructType = {
    val byName = declared.fields.map(f => f.name -> f).toMap
    StructType(specs.zipWithIndex.map {
      case (KvCountStar, i)    => StructField(s"count_star_$i", LongType, nullable = false)
      case (KvCountCol(n), i)  => StructField(s"count_${n}_$i", LongType, nullable = false)
      case (KvMinCol(n), i)    => StructField(s"min_${n}_$i", byName(n).dataType)
      case (KvMaxCol(n), i)    => StructField(s"max_${n}_$i", byName(n).dataType)
    })
  }
}

class KvAggScan(dir: String, rowkeyName: String, declared: StructType,
                filters: Array[Filter], specs: Seq[KvAggSpec],
                asOf: Option[Long] = None)
    extends Scan with Batch {

  private val base =
    new KvScan(dir, rowkeyName, declared, declared, filters, -1, asOf = asOf)

  override def readSchema(): StructType = KvAggSpec.outputSchema(specs, declared)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv-agg $dir PushedAggregates: [${specs.mkString(", ")}], " +
      s"PushedFilters: [${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = base.planInputPartitions()

  // pruning metrics ride the base scan's partition planning
  override def supportedCustomMetrics() = base.supportedCustomMetrics()
  override def reportDriverMetrics() = base.reportDriverMetrics()

  override def createReaderFactory(): PartitionReaderFactory =
    KvAggReaderFactory(dir, declared.json, rowkeyName, filters, specs)
}

case class KvAggReaderFactory(dir: String, declaredJson: String, rowkeyName: String,
                              filters: Array[Filter], specs: Seq[KvAggSpec])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[KvInputPartition]
    new KvAggPartitionReader(dir, part,
      DataType.fromJson(declaredJson).asInstanceOf[StructType], rowkeyName, filters, specs)
  }
}

/** One partial-aggregate row per shard. */
class KvAggPartitionReader(dir: String, part: KvInputPartition, declared: StructType,
                           rowkeyName: String, filters: Array[Filter], specs: Seq[KvAggSpec])
    extends PartitionReader[InternalRow] {

  private var emitted = false
  private val dtByName = declared.fields.map(f => f.name -> f.dataType).toMap
  // read-volume task metrics (same names as the row/columnar readers);
  // the manifest-only COUNT(*) fast path legitimately reads nothing
  private var recordsRead = 0L
  private var bytesRead = 0L

  private def ordering(dt: DataType): Ordering[Any] = dt match {
    case StringType => Ordering.by((v: Any) => v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      .asInstanceOf[Ordering[Any]]
    case _: NumericType | DateType | TimestampType =>
      new Ordering[Any] {
        def compare(a: Any, b: Any): Int = (a, b) match {
          case (x: Long, y: Long) => java.lang.Long.compare(x, y)
          case (x: Int, y: Int) => Integer.compare(x, y)
          case (x: Short, y: Short) => java.lang.Short.compare(x, y)
          case (x: Byte, y: Byte) => java.lang.Byte.compare(x, y)
          case (x: Double, y: Double) => java.lang.Double.compare(x, y)
          case (x: Float, y: Float) => java.lang.Float.compare(x, y)
          case (x: org.apache.spark.sql.types.Decimal,
                y: org.apache.spark.sql.types.Decimal) => x.compare(y)
          case _ => throw new IllegalStateException(s"unorderable $a/$b")
        }
      }
    case BooleanType => Ordering.by((v: Any) => v.asInstanceOf[Boolean]).asInstanceOf[Ordering[Any]]
    case other => throw new IllegalStateException(s"min/max unsupported for $other")
  }

  private def compute(): InternalRow = {
    // fast path: pure COUNT(*) over the whole shard → manifest only
    val countStarOnly = specs.forall(_ == KvCountStar)
    if (countStarOnly && filters.isEmpty && part.startHex.isEmpty && part.endHex.isEmpty)
      return InternalRow.fromSeq(specs.map(_ => part.shard.rows))

    // shared per-column layout ([[KvRecordDecoder]], same hot loop as
    // KvPartitionReader): resolved ONCE; the per-record loop fills a
    // reused scratch array — no per-record hash maps or closures
    val neededCols: Set[String] = specs.collect {
      case KvCountCol(n) => n
      case KvMinCol(n)   => n
      case KvMaxCol(n)   => n
    }.toSet ++ filters.flatMap(_.references)
    val decoder = new KvRecordDecoder(declared, neededCols)

    var countStar = 0L
    val countIdx: Array[Int] =
      specs.collect { case KvCountCol(n) => n }.distinct.map(decoder.idxByName).toArray
    val countVals = new Array[Long](countIdx.length)
    val minMaxNames: Array[String] = specs.collect {
      case KvMinCol(n) => n
      case KvMaxCol(n) => n
    }.distinct.toArray
    val mmIdx: Array[Int] = minMaxNames.map(decoder.idxByName)
    val mmOrd: Array[Ordering[Any]] = minMaxNames.map(n => ordering(dtByName(n)))
    val mmMin = new Array[Any](minMaxNames.length)
    val mmMax = new Array[Any](minMaxNames.length)

    val reader = new KvStore.ShardReader(dir, part.shard,
      part.startHex.map(KvStore.fromHex).orNull,
      part.endHex.map(KvStore.fromHex).orNull, decoder.wantedCell)
    val pred = FilterEval.compile(filters, decoder.idxByName, decoder.dtByName,
      decoder.scratch)
    try {
      while (reader.hasNext) {
        decoder.decodeInto(reader.next())
        recordsRead += 1
        if (pred()) {
          countStar += 1
          var i = 0
          while (i < countIdx.length) {
            if (decoder.scratch(countIdx(i)) != null) countVals(i) += 1
            i += 1
          }
          i = 0
          while (i < mmIdx.length) {
            val v = decoder.scratch(mmIdx(i))
            if (v != null) {
              if (mmMin(i) == null || mmOrd(i).lt(v, mmMin(i))) mmMin(i) = v
              if (mmMax(i) == null || mmOrd(i).gt(v, mmMax(i))) mmMax(i) = v
            }
            i += 1
          }
        }
      }
    } finally { bytesRead = reader.bytesRead; reader.close() }

    val countByName: Map[String, Long] =
      specs.collect { case KvCountCol(n) => n }.distinct
        .zipWithIndex.map { case (n, i) => n -> countVals(i) }.toMap
    val mmPos: Map[String, Int] = minMaxNames.zipWithIndex.toMap
    InternalRow.fromSeq(specs.map {
      case KvCountStar   => countStar
      case KvCountCol(n) => countByName(n)
      case KvMinCol(n)   => mmMin(mmPos(n))
      case KvMaxCol(n)   => mmMax(mmPos(n))
    })
  }

  override def next(): Boolean =
    if (emitted) false else { emitted = true; current = compute(); true }
  private var current: InternalRow = _
  override def get(): InternalRow = current
  override def close(): Unit = ()

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = Array(
    KvScanMetrics.taskMetric("kvRecordsRead", recordsRead),
    KvScanMetrics.taskMetric("kvBytesRead", bytesRead))
}
