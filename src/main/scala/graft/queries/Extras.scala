package graft.queries

import graft.{Q, Tables}
import graft.util.Exact._
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2 surface: non-equi (range) join, GROUPING SETS,
  * array function family, and delegated file sources (csv/json) —
  * round-tripped through a write+read so the format path is exercised,
  * with the oracle on the original parquet. */
object Extras {

  /** Range (interval) join: events ⋈ orders where the event falls within
    * 30 days after the order date, same user/customer. Equi key (user)
    * keeps it a hash join with a residual range predicate — the shape
    * that survives scale (pure interval joins need bucketing by time). */
  val q27RangeJoin: Q = Q(
    "q27_range_join",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val od = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      ev.join(od,
          col("user_id") === col("o_custkey") &&
          col("ts") >= col("o_orderdate") &&
          col("ts") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"), countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, count(*) AS n_pairs, count(DISTINCT o_orderkey) AS n_orders
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
      JOIN orders ON user_id = o_custkey
        AND ts >= o_orderdate AND ts < o_orderdate + INTERVAL 30 DAY
      GROUP BY user_id
      ORDER BY user_id"""),
    doc = "equi+range (interval) join")

  /** Explicit GROUPING SETS with grouping_id disambiguation. */
  val q28GroupingSets: Q = Q(
    "q28_grouping_sets",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(s"""
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
               count(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        ORDER BY rf, ls, gid""")
    },
    Some(s"""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
             count(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      ORDER BY rf, ls, gid"""),
    doc = "GROUPING SETS + grouping()")

  /** Array function family over embeddings: size / element access /
    * slice / contains-style predicate / per-row extremum. */
  val q29ArrayFuncs: Q = Q(
    "q29_array_funcs",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
          round(element_at(col("embedding"), -1).cast("double"), 6).as("e_last"),
          round(array_max(col("embedding")).cast("double"), 6).as("e_max"),
          round(array_min(col("embedding")).cast("double"), 6).as("e_min"),
          size(filter(col("embedding"), x => x > 0f)).as("n_pos"))
        .orderBy(col("vec_id")),
    Some("""
      SELECT vec_id, len(embedding) AS dim,
             round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
             round(CAST(embedding[-1] AS DOUBLE), 6) AS e_last,
             round(CAST(list_max(embedding) AS DOUBLE), 6) AS e_max,
             round(CAST(list_min(embedding) AS DOUBLE), 6) AS e_min,
             len(list_filter(embedding, x -> x > 0)) AS n_pos
      FROM embeddings
      ORDER BY vec_id"""),
    doc = "array/list scalar function parity")

  /** Delegated file formats (SURVEY §2.1 "file sources"): nation flows
    * parquet → csv → json → DataFrame; the oracle reads the original
    * parquet. Proves the csv/json read+write paths preserve values. */
  val q73FileFormats: Q = Q(
    "q73_file_formats",
    (s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-fmt-${new java.io.File(d).getName}"
      val n = Tables.nation(s, d)
      n.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      s.read.option("header", "true").option("inferSchema", "true").csv(s"$tmp/csv")
        .coalesce(1).write.mode("overwrite").json(s"$tmp/json")
      s.read.json(s"$tmp/json")
        .select(col("n_nationkey").cast("int"), col("n_name"), col("n_regionkey").cast("int"))
        .orderBy(col("n_nationkey"))
    },
    Some("""
      SELECT n_nationkey, n_name, n_regionkey
      FROM nation
      ORDER BY n_nationkey"""),
    doc = "csv + json source round-trip")

  def defs: Seq[Q] = Seq(q27RangeJoin, q28GroupingSets, q29ArrayFuncs, q73FileFormats)
}
