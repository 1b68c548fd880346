package graft.queries

import java.io.File

import graft.{Q, Tables}
import graft.util.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries through the graft-kv DSv2 connector — the reference's core
  * surface (catalog-declared schema over a sorted KV store with pushdown).
  *
  * Correctness story: lineitem parquet is copied INTO a KV table (write
  * path), read back through the connector (scan + pushdown + pruning),
  * and aggregated; the DuckDB oracle runs the same query against the
  * ORIGINAL parquet. A hash match proves the whole encode → shard →
  * decode → filter pipeline is lossless and correct.
  */
object KvQueries {

  private val catalogJson =
    """{
      |  "table": {"namespace": "default", "name": "lineitem_kv"},
      |  "rowkey": "lk",
      |  "columns": {
      |    "lk": {"cf": "rowkey", "col": "lk", "type": "long"},
      |    "l_orderkey": {"cf": "m", "col": "ok", "type": "long"},
      |    "l_linenumber": {"cf": "m", "col": "ln", "type": "int"},
      |    "l_quantity": {"cf": "m", "col": "qty", "type": "double"},
      |    "l_extendedprice": {"cf": "m", "col": "price", "type": "double"},
      |    "l_discount": {"cf": "m", "col": "disc", "type": "double"},
      |    "l_returnflag": {"cf": "m", "col": "rf", "type": "string"},
      |    "l_linestatus": {"cf": "m", "col": "ls", "type": "string"},
      |    "l_shipdate": {"cf": "m", "col": "sd", "type": "timestamp"}
      |  }
      |}""".stripMargin

  /** Build (once per sfDir per JVM/host) the KV copy of lineitem, range-
    * partitioned on the synthetic rowkey for non-overlapping shards. */
  private def kvDir(s: SparkSession, sfDir: String): String = {
    // key on basename AND a full-path hash so same-named corpora in
    // different locations never share a cache entry
    val abs = new File(sfDir).getAbsolutePath
    val name = s"${new File(sfDir).getName}-${Integer.toHexString(abs.hashCode)}"
    val dir = graft.kv.KvStore.cacheDir(s"lineitem-$name")
    if (!new File(s"$dir/_kvmeta.json").exists()) {
      Tables.lineitem(s, sfDir)
        .withColumn("lk", col("l_orderkey") * 100 + col("l_linenumber"))
        .select("lk", "l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus",
                "l_shipdate")
        .repartitionByRange(16, col("lk"))
        .write.format("graft-kv")
        .option("catalog", catalogJson).option("path", dir)
        .mode("overwrite").save()
    }
    dir
  }

  private def kv(s: SparkSession, sfDir: String): DataFrame =
    s.read.format("graft-kv")
      .option("catalog", catalogJson).option("path", kvDir(s, sfDir)).load()

  /** Parquet → KV write → KV scan with value filters (pushed) → agg.
    * Exercises EqualTo + LessThan pushdown on cell columns. */
  val q70KvScanFilter: Q = Q(
    "q70_kv_scan_filter",
    (s, d) =>
      kv(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") < 10)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             dsum(col("l_quantity")).as("sum_qty"),
             dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_linestatus")),
    Some(s"""
      SELECT l_linestatus, count(*) AS n,
             ${sqlDsum("l_quantity")} AS sum_qty,
             ${sqlDsum("l_extendedprice")} AS sum_price
      FROM lineitem
      WHERE l_returnflag = 'R' AND l_quantity < 10
      GROUP BY l_linestatus
      ORDER BY l_linestatus"""),
    doc = "KV round-trip + cell-filter pushdown")

  /** Rowkey-range query: shard pruning + in-shard range clip, the
    * reference's open TODO done (HbasePartitionReader.scala:147). */
  val q71KvRowkeyRange: Q = Q(
    "q71_kv_rowkey_range",
    (s, d) =>
      kv(s, d)
        .filter(col("lk") >= 100000L && col("lk") < 200000L)
        .select(col("lk"), col("l_orderkey"), col("l_linenumber"),
                col("l_quantity"), col("l_shipdate"))
        .orderBy(col("lk")),
    Some("""
      SELECT l_orderkey * 100 + l_linenumber AS lk, l_orderkey, l_linenumber,
             l_quantity, l_shipdate
      FROM lineitem
      WHERE l_orderkey * 100 + l_linenumber >= 100000
        AND l_orderkey * 100 + l_linenumber < 200000
      ORDER BY lk"""),
    doc = "rowkey-range shard pruning")

  /** The reference's canonical predicate shape — IN + OR across rowkey
    * and a cell column (`ScalaDatasourceTest.scala:88-91`) — via
    * spark.sql over a temp view of the connector, exactly how the
    * reference is used. */
  val q72KvCanonical: Q = Q(
    "q72_kv_canonical",
    (s, d) => {
      kv(s, d).createOrReplaceTempView("lineitem_kv")
      s.sql("""
        SELECT lk, l_orderkey, l_quantity, l_returnflag
        FROM lineitem_kv
        WHERE lk IN (101, 102, 103, 104, 105) OR l_quantity = 50.0
        ORDER BY lk""")
    },
    Some("""
      SELECT l_orderkey * 100 + l_linenumber AS lk, l_orderkey, l_quantity, l_returnflag
      FROM lineitem
      WHERE (l_orderkey * 100 + l_linenumber) IN (101, 102, 103, 104, 105)
         OR l_quantity = 50.0
      ORDER BY lk"""),
    doc = "reference canonical IN+OR over temp view")

  def defs: Seq[Q] = Seq(q70KvScanFilter, q71KvRowkeyRange, q72KvCanonical)
}
