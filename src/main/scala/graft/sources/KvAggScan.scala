package graft.sources

import graft.kv._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._

/** Aggregate pushdown (SURVEY.md §2.4 stretch — `SupportsPushDownAggregates`,
  * absent in the reference): COUNT(*) / COUNT(col) / MIN / MAX run inside
  * the scan, globally or GROUPED BY declared columns. Each partition
  * emits one partial row per group (one total when ungrouped); Spark's
  * final aggregate merges partials across shards. Global COUNT(*) with
  * no residual predicates is answered from the shard manifest without
  * opening a single shard file.
  *
  * Grouped memory shape: GROUP BY the rowkey streams — shards are
  * key-sorted, so equal keys are adjacent and each group closes as the
  * scan passes it (O(1) state, rows emitted as produced). Any other
  * grouping holds a per-shard hash map, bounded by the shard's record
  * count — itself bounded by the writer's `chunkBytes` — which is the
  * same order of memory Spark's own partial hash aggregate would spend
  * on the shard's rows, minus the row materialization and exchange.
  */
sealed trait KvAggSpec extends Serializable
case object KvCountStar extends KvAggSpec
final case class KvCountCol(name: String) extends KvAggSpec
final case class KvMinCol(name: String) extends KvAggSpec
final case class KvMaxCol(name: String) extends KvAggSpec
/** `checked` = ANSI mode was on at translation: the integral partial
  * accumulates with overflow-CHECKED addition (Math.addExact) so the
  * pushed sum raises on overflow exactly where Spark's own Sum would,
  * instead of silently wrapping under a session that promises
  * ARITHMETIC_OVERFLOW. Non-ANSI partials keep wrap-around addition —
  * associative, so shard partials merged by Spark wrap to the same
  * answer Spark itself computes. */
final case class KvSumCol(name: String, checked: Boolean = false) extends KvAggSpec

object KvAggSpec {
  private def fieldName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case f: NamedReference if f.fieldNames().length == 1 => Some(f.fieldNames()(0))
      case _ => None
    }

  /** SUM pushes for integral (partial accumulates in Long — wrap-around
    * addition is associative, so per-shard partials merged by Spark wrap
    * to the same non-ANSI answer Spark itself computes) and floating
    * (Double) columns. Decimal stays residual: Spark widens decimal sums
    * with precision arithmetic the partial would have to replicate
    * exactly. */
  private def summable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType => true
    case _ => false
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Translate a connector Aggregation into (group columns, agg specs);
    * None → not pushable. MIN/MAX additionally require an orderable
    * declared type — claiming a decimal/binary/array column and then
    * failing executor-side would break a query Spark could run itself.
    * Group columns must be plain declared columns of comparable atomic
    * type (decoded values carry value equality; arrays/maps don't). */
  def translate(agg: Aggregation, declared: StructType): Option[(Seq[String], Seq[KvAggSpec])] = {
    val names = declared.fieldNames.toSet
    val byName = declared.fields.map(f => f.name -> f.dataType).toMap
    val orderable: Set[String] = declared.fields
      .filter(f => FilterEval.comparable(f.dataType)).map(_.name).toSet
    val groupCols: Seq[String] = agg.groupByExpressions().toIndexedSeq.map { e =>
      fieldName(e).filter(orderable).getOrElse(return None)
    }
    val specs = agg.aggregateExpressions().map {
      case _: CountStar => KvCountStar
      case c: Count if !c.isDistinct =>
        fieldName(c.column()).filter(names).map(KvCountCol.apply).getOrElse(return None)
      case m: Min =>
        fieldName(m.column()).filter(orderable).map(KvMinCol.apply).getOrElse(return None)
      case m: Max =>
        fieldName(m.column()).filter(orderable).map(KvMaxCol.apply).getOrElse(return None)
      case s: Sum if !s.isDistinct =>
        fieldName(s.column()).filter(n => byName.get(n).exists(summable))
          .map(n => KvSumCol(n,
            // ANSI sessions (Spark 4's default) promise ARITHMETIC_OVERFLOW
            // on integral sum overflow — the pushed partial must raise
            // instead of wrapping (doubles saturate, never raise)
            checked = byName.get(n).exists(isIntegral) &&
              org.apache.spark.sql.internal.SQLConf.get.ansiEnabled))
          .getOrElse(return None)
      case _ => return None
    }
    Some((groupCols, specs.toIndexedSeq))
  }

  /** The partial sum's column type — Spark's own Sum result type for the
    * input (integral → Long, floating → Double), so the rewritten final
    * Sum merges partials without a cast. */
  def sumType(dt: DataType): DataType = if (isIntegral(dt)) LongType else DoubleType

  /** Scan output schema: group columns FIRST, then one column per agg —
    * the order `V2ScanRelationPushDown` zips its rewritten aggregate
    * against. */
  def outputSchema(groupCols: Seq[String], specs: Seq[KvAggSpec],
                   declared: StructType): StructType = {
    val byName = declared.fields.map(f => f.name -> f).toMap
    StructType(
      groupCols.map(n => StructField(n, byName(n).dataType, byName(n).nullable)) ++
      specs.zipWithIndex.map {
        case (KvCountStar, i)    => StructField(s"count_star_$i", LongType, nullable = false)
        case (KvCountCol(n), i)  => StructField(s"count_${n}_$i", LongType, nullable = false)
        case (KvMinCol(n), i)    => StructField(s"min_${n}_$i", byName(n).dataType)
        case (KvMaxCol(n), i)    => StructField(s"max_${n}_$i", byName(n).dataType)
        case (KvSumCol(n, _), i) => StructField(s"sum_${n}_$i", sumType(byName(n).dataType))
      })
  }
}

class KvAggScan(dir: String, rowkeyName: String, declared: StructType,
                filters: Array[Filter], groupCols: Seq[String], specs: Seq[KvAggSpec],
                asOf: Option[Long] = None, since: Option[Long] = None,
                buckets: Int = 0, bucketPrune: Boolean = true)
    extends Scan with Batch {

  // the base scan owns shard selection (ranges, zone maps, asOf, since,
  // point-lookup bucket pruning — including the bucketPrune escape
  // hatch, threaded through so the A/B knob is symmetric across both
  // scan shapes), so pushed aggregates — including the manifest stats
  // fast path, which reads per-PARTITION shard meta — see exactly the
  // incremental subset
  private val base =
    new KvScan(dir, rowkeyName, declared, declared, filters, -1, asOf = asOf,
      buckets = buckets, since = since, bucketPrune = bucketPrune)

  override def readSchema(): StructType = KvAggSpec.outputSchema(groupCols, specs, declared)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv-agg $dir PushedAggregates: [${specs.mkString(", ")}], " +
      s"PushedGroupBy: [${groupCols.mkString(", ")}], " +
      s"PushedFilters: [${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = base.planInputPartitions()

  // pruning metrics ride the base scan's partition planning
  override def supportedCustomMetrics() = base.supportedCustomMetrics()
  override def reportDriverMetrics() = base.reportDriverMetrics()

  override def createReaderFactory(): PartitionReaderFactory =
    KvAggReaderFactory(dir, declared.json, rowkeyName, filters, groupCols, specs)
}

case class KvAggReaderFactory(dir: String, declaredJson: String, rowkeyName: String,
                              filters: Array[Filter], groupCols: Seq[String],
                              specs: Seq[KvAggSpec])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = KvInputPartition.unwrap(p) // base scan keys bucketed shards
    val declared = DataType.fromJson(declaredJson).asInstanceOf[StructType]
    // a bloom-skipped shard contributes no rows, hence no partials
    if (!KvBloomPrune.canMatch(dir, part.shard, filters, declared))
      new KvBloomSkippedReader[InternalRow]
    else new KvAggPartitionReader(dir, part, declared, rowkeyName, filters,
      groupCols, specs)
  }
}

/** Partial-aggregate rows per shard: one per group (one total when the
  * aggregation is global). */
class KvAggPartitionReader(dir: String, part: KvInputPartition, declared: StructType,
                           rowkeyName: String, filters: Array[Filter],
                           groupCols: Seq[String], specs: Seq[KvAggSpec])
    extends PartitionReader[InternalRow] {

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

  /** Mutable per-group partial state (counts + min/max + sums per
    * column). Integral sums accumulate in Long (wrap-around addition is
    * associative — partials merged by Spark wrap to the same non-ANSI
    * answer); floating sums in Double. `sumSeen` keeps an all-null
    * group's sum NULL, as SQL requires. */
  private final class GroupState(nCounts: Int, nMm: Int, nSums: Int) {
    var countStar = 0L
    val counts = new Array[Long](nCounts)
    val mins = new Array[Any](nMm)
    val maxs = new Array[Any](nMm)
    val sumsL = new Array[Long](nSums)
    val sumsD = new Array[Double](nSums)
    val sumSeen = new Array[Boolean](nSums)
  }

  // shared per-column layout ([[KvRecordDecoder]], same hot loop as
  // KvPartitionReader): resolved ONCE; the per-record loop fills a
  // reused scratch array — no per-record hash maps or closures.
  // Grouping needs its key columns decoded too.
  private val neededCols: Set[String] = specs.collect {
    case KvCountCol(n) => n
    case KvMinCol(n)   => n
    case KvMaxCol(n)   => n
    case KvSumCol(n, _) => n
  }.toSet ++ groupCols ++ filters.flatMap(_.references)

  private val countNames: Seq[String] = specs.collect { case KvCountCol(n) => n }.distinct
  private val minMaxNames: Seq[String] = specs.collect {
    case KvMinCol(n) => n
    case KvMaxCol(n) => n
  }.distinct
  private val sumNames: Seq[String] = specs.collect { case KvSumCol(n, _) => n }.distinct
  private val countPos: Map[String, Int] = countNames.zipWithIndex.toMap
  private val mmPos: Map[String, Int] = minMaxNames.zipWithIndex.toMap
  private val sumPos: Map[String, Int] = sumNames.zipWithIndex.toMap
  private val mmOrd: Array[Ordering[Any]] =
    minMaxNames.map(n => ordering(dtByName(n))).toArray
  private val sumIntegral: Array[Boolean] =
    sumNames.map(n => KvAggSpec.sumType(dtByName(n)) == LongType).toArray
  private val sumChecked: Array[Boolean] =
    sumNames.map(n => specs.exists {
      case KvSumCol(`n`, c) => c
      case _ => false
    }).toArray

  private def resultRow(groupKey: Array[Any], st: GroupState): InternalRow =
    InternalRow.fromSeq(groupKey.toIndexedSeq ++ specs.map {
      case KvCountStar   => st.countStar
      case KvCountCol(n) => st.counts(countPos(n))
      case KvMinCol(n)   => st.mins(mmPos(n))
      case KvMaxCol(n)   => st.maxs(mmPos(n))
      case KvSumCol(n, _) =>
        val p = sumPos(n)
        if (!st.sumSeen(p)) null
        else if (sumIntegral(p)) st.sumsL(p) else st.sumsD(p)
    })

  private def accumulate(st: GroupState, decoder: KvRecordDecoder,
                         countIdx: Array[Int], mmIdx: Array[Int],
                         sumIdx: Array[Int]): Unit = {
    st.countStar += 1
    var i = 0
    while (i < countIdx.length) {
      if (decoder.scratch(countIdx(i)) != null) st.counts(i) += 1
      i += 1
    }
    i = 0
    while (i < mmIdx.length) {
      val v = decoder.scratch(mmIdx(i))
      if (v != null) {
        if (st.mins(i) == null || mmOrd(i).lt(v, st.mins(i))) st.mins(i) = v
        if (st.maxs(i) == null || mmOrd(i).gt(v, st.maxs(i))) st.maxs(i) = v
      }
      i += 1
    }
    i = 0
    while (i < sumIdx.length) {
      val v = decoder.scratch(sumIdx(i))
      if (v != null) {
        st.sumSeen(i) = true
        if (sumIntegral(i)) {
          val x = v.asInstanceOf[Number].longValue()
          // checked = ANSI session: raise on overflow like Spark's Sum —
          // via Spark's error class (ARITHMETIC_OVERFLOW), not a bare
          // JVM ArithmeticException, so callers matching on the
          // documented class see the same exception as the unpushed plan
          st.sumsL(i) =
            if (sumChecked(i))
              try Math.addExact(st.sumsL(i), x)
              catch { case _: ArithmeticException =>
                throw org.apache.spark.graft.GraftSparkErrors
                  .arithmeticOverflow("long overflow", "try_add")
              }
            else st.sumsL(i) + x
        } else st.sumsD(i) += v.asInstanceOf[Number].doubleValue()
      }
      i += 1
    }
  }

  /** Manifest value for one aggregate spec, when the whole-shard answer
    * is recorded there: COUNT(*) = shard rows; MIN/MAX = the rowkey
    * bounds (minKeyHex/maxKeyHex) for the key column, zone-map bounds
    * for cell columns. Exactness caveats: bounds cover non-null values
    * only — exactly MIN/MAX's semantics; timestamps are EXCLUDED (the
    * key encoding floors micros to millis, so the stored max is not the
    * true max); a missing zone-map entry (all-null column, oversized
    * bound, legacy manifest) returns None and the shard falls back to a
    * real scan. */
  private def manifestValue(spec: KvAggSpec): Option[Any] = spec match {
    case KvCountStar => Some(part.shard.rows)
    case KvMinCol(n) => manifestBound(n, isMax = false)
    case KvMaxCol(n) => manifestBound(n, isMax = true)
    case _ => None // COUNT(col) needs a null count; SUM needs the values
  }

  private def manifestBound(n: String, isMax: Boolean): Option[Any] = {
    val fld = declared.fields.find(_.name == n).getOrElse(return None)
    val dt = fld.dataType
    if (dt == TimestampType || part.shard.rows == 0L) return None
    val cf = fld.metadata.getString("columnFamily")
    if (cf == KvCatalog.RowkeyCf)
      Some(BytesCodec.decodeKey(dt,
        KvStore.fromHex(if (isMax) part.shard.maxKeyHex else part.shard.minKeyHex)))
    else
      part.shard.stats.get(s"$cf:${fld.metadata.getString("column")}").map {
        case (mnHex, mxHex) =>
          BytesCodec.decodeKey(dt, KvStore.fromHex(if (isMax) mxHex else mnHex))
      }
  }

  /** The whole computation as an iterator of output rows. Ungrouped →
    * exactly one row. GROUP BY the rowkey → true streaming (groups are
    * contiguous in key-sorted shards; each closes as the key changes).
    * Other groupings → per-shard hash map, emitted after the scan. */
  private def compute(): Iterator[InternalRow] = {
    // fast path: global COUNT(*)/MIN/MAX over the whole shard can be
    // answered from the manifest entry without opening the file — the
    // decision is PER SHARD, so one legacy shard missing a bound only
    // costs that shard a scan
    if (groupCols.isEmpty && filters.isEmpty && part.isFullRange) {
      val vals = specs.map(manifestValue)
      if (vals.forall(_.isDefined))
        return Iterator.single(InternalRow.fromSeq(vals.map(_.get)))
    }

    val decoder = new KvRecordDecoder(declared, neededCols)
    val countIdx: Array[Int] = countNames.map(decoder.idxByName).toArray
    val mmIdx: Array[Int] = minMaxNames.map(decoder.idxByName).toArray
    val sumIdx: Array[Int] = sumNames.map(decoder.idxByName).toArray
    val groupIdx: Array[Int] = groupCols.map(decoder.idxByName).toArray
    def newState() = new GroupState(countNames.length, minMaxNames.length, sumNames.length)

    val reader = new KvStore.ShardReader(dir, part.shard,
      wanted = decoder.wantedCell, ranges = part.decodedRanges)
    openReader = reader
    val pred = FilterEval.compile(filters, decoder.idxByName, decoder.dtByName,
      decoder.scratch)

    def groupKey(): Array[Any] = {
      val k = new Array[Any](groupIdx.length)
      var i = 0
      while (i < groupIdx.length) { k(i) = decoder.scratch(groupIdx(i)); i += 1 }
      k
    }

    if (groupCols.isEmpty) {
      val st = newState()
      try {
        while (reader.hasNext) {
          decoder.decodeInto(reader.next())
          recordsRead += 1
          if (pred()) accumulate(st, decoder, countIdx, mmIdx, sumIdx)
        }
      } finally closeReader()
      Iterator.single(resultRow(Array.empty, st))
    } else if (groupCols == Seq(rowkeyName)) {
      // key-sorted shard + rowkey grouping: equal keys are adjacent, so
      // each group closes (and its row is served) the moment the key
      // changes — O(1) state regardless of group count
      new Iterator[InternalRow] {
        private var openKey: Array[Any] = _
        private var st: GroupState = _
        private var pending: InternalRow = _
        private var done = false
        private def advance(): Unit = {
          while (pending == null && !done) {
            if (!reader.hasNext) {
              done = true
              closeReader()
              if (st != null) { pending = resultRow(openKey, st); st = null }
            } else {
              decoder.decodeInto(reader.next())
              recordsRead += 1
              if (pred()) {
                val k = decoder.scratch(groupIdx(0))
                if (st == null) {
                  openKey = Array[Any](k)
                  st = newState()
                } else if (k != openKey(0)) {
                  pending = resultRow(openKey, st)
                  openKey = Array[Any](k)
                  st = newState()
                }
                accumulate(st, decoder, countIdx, mmIdx, sumIdx)
              }
            }
          }
        }
        override def hasNext: Boolean = { advance(); pending != null }
        override def next(): InternalRow = {
          advance()
          val r = pending; pending = null; r
        }
      }
    } else {
      // general grouping: per-shard hash partials. Key values come out
      // of the decoder freshly allocated, so storing references is safe;
      // ArraySeq gives element-wise equality incl. nulls (SQL group-by
      // null semantics: nulls form one group).
      val groups = new java.util.LinkedHashMap[Seq[Any], GroupState]()
      try {
        while (reader.hasNext) {
          decoder.decodeInto(reader.next())
          recordsRead += 1
          if (pred()) {
            val key: Seq[Any] = scala.collection.immutable.ArraySeq.unsafeWrapArray(groupKey())
            var st = groups.get(key)
            if (st == null) {
              st = newState()
              groups.put(key, st)
            }
            accumulate(st, decoder, countIdx, mmIdx, sumIdx)
          }
        }
      } finally closeReader()
      val it = groups.entrySet().iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = {
          val e = it.next()
          resultRow(e.getKey.toArray, e.getValue)
        }
      }
    }
  }

  private var openReader: KvStore.ShardReader = _
  private def closeReader(): Unit = if (openReader != null) {
    bytesRead = openReader.bytesRead
    openReader.close()
    openReader = null
  }

  private var rows: Iterator[InternalRow] = _
  private var current: InternalRow = _
  override def next(): Boolean = {
    if (rows == null) rows = compute()
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = closeReader()

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = Array(
    KvScanMetrics.taskMetric("kvRecordsRead", recordsRead),
    KvScanMetrics.taskMetric("kvBytesRead", bytesRead))
}
