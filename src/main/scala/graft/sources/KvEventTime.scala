package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Event-time contract for KV streaming reads (`option("eventTimeColumn",
  * c)`) — what lets a KV micro-batch stream drive watermarks and windowed
  * aggregations like any production ingest source.
  *
  * Two source shapes:
  *  - a TIMESTAMP column: already watermarkable; the option validates the
  *    contract (column exists, right type) and surfaces nothing new —
  *    `withWatermark(c, …)` binds directly.
  *  - an epoch LONG column (the common KV layout — versions and ingest
  *    stamps are longs): the scan appends a derived `_event_time`
  *    TIMESTAMP column the user watermarks. `eventTimeUnit` names the
  *    epoch unit (`micros` default, `millis`, `seconds`, `nanos`).
  *    Spark's internal timestamp IS epoch micros, so the derivation is a
  *    per-row long rescale in the reader — no datetime parsing, no UDF.
  *
  * Validation is load-time and loud: an unknown column, an unwatermarkable
  * type, or a `_event_time` name collision fails before any stream starts
  * — never a silently absent watermark. */
final case class KvEventTime(sourceCol: String, mul: Long, div: Long,
                             nullable: Boolean) {
  /** Epoch long in the source unit → epoch micros (Spark's internal
    * TimestampType representation). */
  def toMicros(v: Long): Long = v * mul / div
}

object KvEventTime {
  val EventTimeCol = "_event_time"

  /** Parse + validate the option pair against the declared schema.
    * None = option absent, or present on a timestamp column (contract
    * holds, nothing to derive). */
  def parse(options: CaseInsensitiveStringMap, declared: StructType): Option[KvEventTime] = {
    val col = options.get("eventTimeColumn")
    if (col == null) return None
    val f = declared.fields.find(_.name == col).getOrElse(
      throw new IllegalArgumentException(
        s"eventTimeColumn '$col' is not a declared column " +
          s"(have: ${declared.fieldNames.mkString(", ")})"))
    f.dataType match {
      case TimestampType | TimestampNTZType =>
        require(options.get("eventTimeUnit") == null,
          s"eventTimeUnit applies only to epoch long columns; '$col' is already a timestamp")
        None // watermark the column itself
      case LongType =>
        require(!declared.fieldNames.contains(EventTimeCol),
          s"cannot derive $EventTimeCol: the catalog already declares a column of that name")
        val (mul, div) = options.getOrDefault("eventTimeUnit", "micros") match {
          case "micros"  => (1L, 1L)
          case "millis"  => (1000L, 1L)
          case "seconds" => (1000000L, 1L)
          case "nanos"   => (1L, 1000L)
          case other => throw new IllegalArgumentException(
            s"eventTimeUnit '$other' (expected micros|millis|seconds|nanos)")
        }
        Some(KvEventTime(col, mul, div, f.nullable))
      case other =>
        throw new IllegalArgumentException(
          s"eventTimeColumn '$col' has unwatermarkable type ${other.simpleString}; " +
            "need timestamp or epoch long")
    }
  }

  /** Table/read schema with the derived column appended (last, like a
    * metadata column — stable position regardless of catalog edits). */
  def withEventTime(declared: StructType, ev: Option[KvEventTime]): StructType =
    ev match {
      case Some(e) =>
        StructType(declared.fields :+
          StructField(EventTimeCol, TimestampType, e.nullable))
      case None => declared
    }

  /** Serialized form for the driver→executor factory boundary (mirrors
    * the JSON-schema convention of [[KvPartitionReaderFactory]]):
    * "col,mul,div,nullable" or "" for none. */
  def encode(ev: Option[KvEventTime]): String =
    ev.map(e => s"${e.sourceCol},${e.mul},${e.div},${e.nullable}").getOrElse("")
  def decode(s: String): Option[KvEventTime] =
    if (s.isEmpty) None
    else {
      val Array(c, m, d, n) = s.split(",", 4)
      Some(KvEventTime(c, m.toLong, d.toLong, n.toBoolean))
    }
}
