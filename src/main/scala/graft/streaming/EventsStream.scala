package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY.md §2.9 — entirely
  * ABSENT in the reference; pure green-field Spark work).
  *
  * The batch twins live in graft.queries.EventsTime (q21–q23); these
  * streaming versions add watermarks + incremental state. The file
  * source scales: at 100 TB the same code points at an object-store
  * prefix (or Kafka) and the state store shards by key across executors.
  */
object EventsStream {

  /** events.parquet raw layout with ts as nanos long — the shape driver
    * testdata used when the parquet physical type was TIMESTAMP(NANOS)
    * (unreadable as TimestampType; converted after read, identically to
    * graft.Tables.events). Newer testdata ships timestamp[us]; see
    * readStream, which sniffs the footer and branches. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream of events from a directory of parquet files.
    * Streaming file sources need a user-supplied schema, so sniff the
    * physical ts type with a one-footer batch read, then normalize to
    * session TimestampType either way (same rule as graft.Tables.events). */
  def readStream(s: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // an initially-empty directory has no footer to sniff — fall back to
    // rawSchema (the nanos-as-long shape) so a stream can start AHEAD of
    // the first file landing, the way file sources normally tolerate
    val physical =
      try s.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => rawSchema }
    val raw = s.readStream
      .schema(physical)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
    val tsNorm = physical("ts").dataType match {
      case LongType      => timestamp_micros(expr("ts div 1000"))
      case TimestampType => col("ts")
      case _             => col("ts").cast(TimestampType) // TIMESTAMP_NTZ
    }
    raw.withColumn("ts", tsNorm)
  }

  /** Tumbling 1-hour windowed counts with a 10-minute watermark —
    * append mode emits a window once the watermark passes its end. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("total_value"))

  /** Session windows (30-minute gap) per user, streaming flavor of q23. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Streaming exact dedup by event id — the ingestion-time guard of a
    * training-data pipeline (at-least-once upstreams redeliver).
    * `dropDuplicatesWithinWatermark` keeps dedup state only until the
    * watermark passes an event's timestamp, so state is bounded by the
    * lateness budget instead of growing with the stream — the property
    * that makes exact streaming dedup viable at 100 TB/day. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: click attribution to a preceding view
    * by the same user within a 6-hour window — the canonical two-stream
    * enrichment. Both sides carry watermarks and the join condition
    * bounds event-time distance, so Spark evicts a buffered view once
    * the click-side watermark passes `view_ts + 6h` (and vice versa):
    * join state is proportional to lateness budget + attribution window,
    * NOT to stream history — the property that makes stream-stream joins
    * viable on an unbounded 100 TB/day feed. Inner joins emit each match
    * as soon as both sides have arrived (no emission delay). */
  def attributionJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    views.join(clicks,
        col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 6 HOURS"))
      .select(col("view_id"), col("click_id"), col("user_id"),
        col("view_ts"), col("click_ts"))
  }

  case class UserEvent(event_id: Long, user_id: Long, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * count/value, updated every micro-batch (SURVEY §2.9 "custom state"
    * surface). */
  def runningUserTotals(events: DataFrame): Dataset[UserRunning] = {
    val s = events.sparkSession
    import s.implicits._
    events.select(col("event_id"), col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }
}
