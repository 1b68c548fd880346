package graft.queries

import graft.{Q, Tables}
import graft.util.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operators over the `events` table: tumbling / sliding /
  * session windows (the batch twins of the Structured Streaming versions
  * in graft.streaming), an as-of join, and JSON property extraction.
  *
  * Scale notes: the as-of join uses the union+last_value carry-forward
  * formulation — ONE shuffle on the key, no row explosion — instead of a
  * time-range join + dedup, which explodes to |events|×|orders-per-key|
  * intermediate rows. This is the formulation that survives 100 TB.
  */
object EventsTime {

  /** Tumbling 1-hour windows via functions.window(). */
  val q21Tumbling: Q = Q(
    "q21_tumbling_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
                col("n"), col("total_value"))
        .orderBy(col("window_start"), col("event_type")),
    Some(s"""
      SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
             event_type, count(*) AS n, ${sqlDsum("value")} AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type"""),
    doc = "tumbling event-time window")

  /** Sliding 1-hour window every 30 minutes: each event lands in two
    * overlapping windows. Oracle expands the same two window-starts per
    * event with a UNION ALL. */
  val q22Sliding: Q = Q(
    "q22_sliding_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("w.start").as("window_start"), col("n"), col("total_value"))
        .orderBy(col("window_start")),
    Some(s"""
      SELECT window_start, count(*) AS n, ${sqlDsum("value")} AS total_value
      FROM (
        SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS window_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) - INTERVAL 30 MINUTE AS window_start, value FROM events
      ) t
      GROUP BY window_start
      ORDER BY window_start"""),
    doc = "sliding event-time window (1h / 30m)")

  /** Session windows with a 30-minute inactivity gap, per user.
    * Spark semantics: a new session starts when the gap to the previous
    * event is >= the gap duration (window end is exclusive); the oracle
    * reproduces that with lag + a running session counter. */
  val q23SessionWindow: Q = Q(
    "q23_session_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
                col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start")),
    Some(s"""
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        FROM e),
      numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
             ${sqlDsum("value")} AS session_value
      FROM numbered
      GROUP BY user_id, sid
      ORDER BY user_id, session_start"""),
    doc = "session window, 30min gap")

  /** As-of join: latest order (strictly at-or-before the event time) per
    * event, by user/customer key. Implemented scalably: tag + union both
    * inputs, ONE shuffle+sort by (key, time, tag), carry the latest order
    * forward with last_value(ignoreNulls) — no row explosion. The right
    * side is first reduced to one row per (key, time) so the as-of pick
    * is deterministic; DuckDB's native ASOF JOIN is the oracle. */
  val q24AsofJoin: Q = Q(
    "q24_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id").as("k"), col("ts").cast("timestamp").as("t"),
                col("event_id"))
      // one row per (custkey, orderdate): deterministic as-of target
      val od = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      val updates = od.select(col("k"), col("t"), lit(0).as("is_query"),
        col("o_orderkey"), col("t").as("o_date"), lit(null).cast("long").as("event_id"))
      val queries = ev.select(col("k"), col("t"), lit(1).as("is_query"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("timestamp").as("o_date"), col("event_id"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("is_query"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      updates.unionByName(queries)
        .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("last_orderdate", last(col("o_date"), ignoreNulls = true).over(w))
        .filter(col("is_query") === 1 && col("last_orderkey").isNotNull)
        .select(col("event_id"), col("k").as("user_id"),
                col("last_orderkey").as("o_orderkey"),
                col("last_orderdate").as("o_orderdate"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH od AS (
        SELECT o_custkey AS k, o_orderdate AS t, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, od.o_orderkey, od.t AS o_orderdate
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
      ASOF JOIN od ON e.user_id = od.k AND e.ts >= od.t
      ORDER BY e.event_id"""),
    doc = "as-of join via union + carry-forward (single shuffle)")

  /** JSON property extraction from the events.props column. */
  val q25JsonExtract: Q = Q(
    "q25_json_extract",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .groupBy((col("k_val") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k_val")).as("sum_k"))
        .orderBy(col("k_bucket")),
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
             count(*) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      FROM events
      GROUP BY 1
      ORDER BY k_bucket"""),
    doc = "JSON scalar extraction + agg")

  /** Batch twin of the STREAMING attribution join — built by the very
    * same [[graft.streaming.EventsStream.attributionJoin]] function the
    * streaming spec drives (the Dataset API's batch/stream unification:
    * `withWatermark` is a no-op on a batch frame). One definition, two
    * execution modes: this batch side is hash-checked by the DuckDB
    * oracle; EventsStreamSpec asserts the micro-batched run emits the
    * identical relation. */
  val q90AttributionJoin: Q = Q(
    "q90_attribution_join",
    (s, d) =>
      graft.streaming.EventsStream.attributionJoin(Tables.events(s, d))
        .orderBy(col("view_id"), col("click_id")),
    Some("""
      WITH v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS view_ts
                 FROM events WHERE event_type = 'view'),
      c AS (SELECT event_id AS click_id, user_id AS click_user, CAST(ts AS TIMESTAMP) AS click_ts
            FROM events WHERE event_type = 'click')
      SELECT view_id, click_id, user_id, view_ts, click_ts
      FROM v JOIN c ON user_id = click_user
         AND click_ts >= view_ts AND click_ts <= view_ts + INTERVAL 6 HOUR
      ORDER BY view_id, click_id"""),
    doc = "view→click attribution interval join (same code runs streaming, q.v. EventsStreamSpec)")

  def defs: Seq[Q] = Seq(q21Tumbling, q22Sliding, q23SessionWindow, q24AsofJoin,
    q25JsonExtract, q90AttributionJoin)
}
