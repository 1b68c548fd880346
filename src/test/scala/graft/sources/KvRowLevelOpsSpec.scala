package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL UPDATE / MERGE / unpushable DELETE through the group-based
  * copy-on-write rewrite ([[KvRowLevelOperation]]). */
class KvRowLevelOpsSpec extends SparkSpec {

  private def catJson(name: String) =
    s"""{"table":{"name":"$name"},"rowkey":"k","columns":{""" +
      """"k":{"cf":"rowkey","col":"k","type":"long"},""" +
      """"grp":{"cf":"f","col":"g","type":"string"},""" +
      """"v":{"cf":"f","col":"v","type":"long"}}}"""

  private def freshTable(tbl: String, rows: Long = 800L, shards: Int = 8): String = {
    val dir = Files.createTempDirectory(s"graft-kv-$tbl").toString
    import spark.implicits._
    (1L to rows).map(k => (k, if (k <= rows / 2) "a" else "b", k * 10))
      .toDF("k", "grp", "v")
      .repartitionByRange(shards, col("k"))
      .write.format("graft-kv").option("catalog", catJson(tbl)).option("path", dir)
      .mode("overwrite").save()
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""
      CREATE TABLE $tbl USING `graft-kv`
      OPTIONS (catalog '${catJson(tbl)}', path '$dir')""")
    dir
  }

  private def table(tbl: String): DataFrame = spark.table(tbl)

  test("UPDATE with a pushable predicate rewrites only the affected shards") {
    val dir = freshTable("graft_upd")
    try {
      val before = graft.kv.KvStore.readMeta(dir)
      assert(before.shards.length == 8)

      spark.sql("UPDATE graft_upd SET v = v + 1, grp = 'z' WHERE k <= 100")
      val after = graft.kv.KvStore.readMeta(dir)
      // rowkey-range pruning: shards beyond [1,100] keep their files
      val untouched = before.shards.map(_.file).toSet
        .intersect(after.shards.map(_.file).toSet)
      assert(untouched.nonEmpty, "shards outside the update range must keep their files")
      assert(after.version == before.version + 1)

      val got = table("graft_upd").filter(col("k") <= 100)
        .select("k", "grp", "v").collect()
      assert(got.length == 100)
      assert(got.forall(r => r.getString(1) == "z" && r.getLong(2) == r.getLong(0) * 10 + 1))
      // rows of the SAME shard outside the predicate stay intact
      val kept = table("graft_upd").filter(col("k") > 100)
        .select("k", "grp", "v").collect()
      assert(kept.length == 700)
      assert(kept.forall(r => r.getString(1) != "z" && r.getLong(2) == r.getLong(0) * 10))
      assert(graft.kv.KvStore.verifyTable(dir) == after.shards.length,
        "replacement shards carry fresh CRCs")

      // pre-update snapshot replays (replaced inputs on the grace clock)
      val pinned = spark.read.format("graft-kv")
        .option("catalog", catJson("graft_upd")).option("path", dir)
        .option("asOfVersion", before.version.toString).load()
      assert(pinned.filter(col("grp") === "z").count() == 0,
        "pre-update snapshot must not see updated rows")
      assert(pinned.count() == 800)

      // rewrite watermark: stamped by the DML commit, CARRIED (not
      // bumped) by a later plain append — derived-state consumers use
      // `lastRewriteVersion > indexedVersion` as their staleness signal
      assert(after.lastRewriteVersion == after.version,
        "row-level rewrite must stamp lastRewriteVersion")
      import spark.implicits._
      Seq((9001L, "x", 1L)).toDF("k", "grp", "v")
        .write.format("graft-kv").option("catalog", catJson("graft_upd"))
        .option("path", dir).mode("append").save()
      val appended = graft.kv.KvStore.readMeta(dir)
      assert(appended.version == after.version + 1)
      assert(appended.lastRewriteVersion == after.version,
        "a plain append must carry the rewrite watermark, not advance it")
    } finally spark.sql("DROP TABLE IF EXISTS graft_upd")
  }

  test("UPDATE with an UNPUSHABLE predicate still works (full-scan rewrite)") {
    freshTable("graft_updu", rows = 200L, shards = 4)
    try {
      spark.sql("UPDATE graft_updu SET v = -1 WHERE length(grp) = 1 AND k % 7 = 0")
      val neg = table("graft_updu").filter(col("v") === -1).select("k").collect()
        .map(_.getLong(0)).sorted
      assert(neg.toSeq == (1L to 200L).filter(_ % 7 == 0))
      assert(table("graft_updu").count() == 200)
    } finally spark.sql("DROP TABLE IF EXISTS graft_updu")
  }

  test("UPDATE rewrites stats: manifest MIN/MAX reflects the new values") {
    freshTable("graft_upds", rows = 100L, shards = 2)
    try {
      // raise every v in the low shard by 1000000: replacement shards go
      // through the normal writer, so zone-map stats are recomputed and
      // the manifest-answered MAX must see the new extreme
      spark.sql("UPDATE graft_upds SET v = v + 1000000 WHERE k <= 50")
      val mx = table("graft_upds").agg(max(col("v"))).head().getLong(0)
      assert(mx == 1000000L + 500L, s"expected updated max, got $mx")
    } finally spark.sql("DROP TABLE IF EXISTS graft_upds")
  }

  test("DELETE with an unpushable predicate routes through the group rewrite") {
    val dir = freshTable("graft_delu", rows = 300L, shards = 4)
    try {
      // length(grp) = 1 fails canDeleteWhere (not pushable) — previously
      // a hard error, now a distributed copy-on-write delete
      spark.sql("DELETE FROM graft_delu WHERE length(grp) = 1 AND v > 2500")
      val left = table("graft_delu").select("k").collect().map(_.getLong(0)).sorted
      assert(left.toSeq == (1L to 250L))
      assert(graft.kv.KvStore.verifyTable(dir) > 0)
    } finally spark.sql("DROP TABLE IF EXISTS graft_delu")
  }

  test("MERGE INTO: matched rows update, unmatched rows insert") {
    freshTable("graft_mrg", rows = 100L, shards = 2)
    try {
      import spark.implicits._
      Seq((90L, 900000L), (95L, 950000L), (101L, 1010L), (150L, 1500L))
        .toDF("k", "nv").createOrReplaceTempView("mrg_src")
      spark.sql("""
        MERGE INTO graft_mrg t USING mrg_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED THEN INSERT (k, grp, v) VALUES (s.k, 'new', s.nv)""")
      val m = table("graft_mrg").select("k", "v").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m.size == 102, s"100 original + 2 inserts, got ${m.size}")
      assert(m(90L) == 900000L && m(95L) == 950000L)
      assert(m(101L) == 1010L && m(150L) == 1500L)
      assert(m(1L) == 10L, "unmatched existing rows keep their values")
      val grps = table("graft_mrg").filter(col("k") > 100).select("grp")
        .collect().map(_.getString(0))
      assert(grps.forall(_ == "new"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_mrg")
  }

  test("UPDATE commit detects a concurrent compaction and aborts cleanly; retry succeeds") {
    val dir = freshTable("graft_updc", rows = 400L, shards = 8)
    try {
      // simulate "compaction superseded a scanned shard mid-rewrite":
      // plan a scan against the pre-compaction manifest, compact, then
      // try to commit a replacement for the now-superseded inputs
      val cat = graft.kv.KvCatalog.parse(catJson("graft_updc"))
      val op = new KvRowLevelOperation(cat, dir,
        org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE)
      val scan = new KvGroupScanBuilder(cat, dir, op).build()
      assert(scan.toBatch.planInputPartitions().length == 8)
      assert(graft.kv.KvCompactor.compact(dir, targetBytes = 1L << 30) > 0,
        "compaction must supersede the scanned shards")
      val write = new KvReplaceGroupsWrite(cat, dir, cat.schema,
        KvDataWriter.DefaultChunkBytes, op)
      val e = intercept[IllegalStateException](write.commit(Array.empty))
      assert(e.getMessage.contains("concurrent maintenance"))
      // table is intact: nothing was lost to the aborted swap
      assert(spark.table("graft_updc").count() == 400)
      assert(graft.kv.KvStore.verifyTable(dir) > 0)
      // the retried statement plans against the fresh manifest and lands
      spark.sql("UPDATE graft_updc SET v = 0 WHERE k <= 10")
      assert(spark.table("graft_updc").filter(col("v") === 0).count() == 10)
    } finally spark.sql("DROP TABLE IF EXISTS graft_updc")
  }

  test("model fuzz: random UPDATE/DELETE/MERGE + maintenance track an in-memory model") {
    // Deterministic sequence of row-level mutations applied BOTH to the
    // KV table (through Spark SQL → group-based copy-on-write) and to a
    // plain in-memory map, with compact+vacuum interleaved — the
    // directed specs above pin individual semantics; this pins their
    // COMPOSITION (predicate pushability mix, rewrites over rewritten
    // shards, maintenance between mutations) against an oracle that
    // cannot share a bug with the engine.
    val rnd = new scala.util.Random(20260814L)
    val dir = freshTable("graft_fuzzrl", rows = 600L, shards = 6)
    try {
      val model = scala.collection.mutable.Map[Long, (String, Long)]()
      (1L to 600L).foreach(k => model(k) = (if (k <= 300) "a" else "b", k * 10))

      def randPred(): (String, (Long, (String, Long)) => Boolean) =
        rnd.nextInt(4) match {
          case 0 =>
            val lo = rnd.nextInt(650) + 1L; val hi = lo + rnd.nextInt(80)
            (s"k BETWEEN $lo AND $hi", (k, _) => k >= lo && k <= hi)
          case 1 =>
            val g = Seq("a", "b", "m")(rnd.nextInt(3))
            (s"grp = '$g'", (_, gv) => gv._1 == g)
          case 2 => // unpushable: exercises the full-scan rewrite path
            val m = rnd.nextInt(9) + 2
            (s"k % $m = 0", (k, _) => k % m == 0)
          case 3 =>
            val t = rnd.nextInt(8000).toLong
            (s"v > $t", (_, gv) => gv._2 > t)
        }

      def check(tag: String): Unit = {
        val got = table("graft_fuzzrl").select("k", "grp", "v").collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
        assert(got == model.toMap,
          s"$tag: table diverged from model (" +
            s"extra=${(got.keySet -- model.keySet).toSeq.sorted.take(5)}, " +
            s"missing=${(model.keySet -- got.keySet).toSeq.sorted.take(5)}, " +
            s"changed=${got.keySet.intersect(model.keySet).filter(k => got(k) != model(k)).toSeq.sorted.take(5)})")
      }

      (1 to 24).foreach { i =>
        rnd.nextInt(3) match {
          case 0 =>
            val (sql, p) = randPred()
            val delta = rnd.nextInt(5) + 1L
            spark.sql(s"UPDATE graft_fuzzrl SET v = v + $delta WHERE $sql")
            model.keys.toSeq.foreach { k =>
              val gv = model(k); if (p(k, gv)) model(k) = (gv._1, gv._2 + delta)
            }
          case 1 =>
            val (sql, p) = randPred()
            spark.sql(s"DELETE FROM graft_fuzzrl WHERE $sql")
            model.keys.toSeq.filter(k => p(k, model(k))).foreach(model.remove)
          case 2 => // upsert a random key band from a source view
            import spark.implicits._
            val lo = rnd.nextInt(700) + 1L; val n = rnd.nextInt(25) + 1
            (lo until lo + n).map(k => (k, k * 100 + i))
              .toDF("k", "nv").createOrReplaceTempView("fuzz_src")
            spark.sql(s"""
              MERGE INTO graft_fuzzrl t USING fuzz_src s ON t.k = s.k
              WHEN MATCHED THEN UPDATE SET v = s.nv, grp = 'm'
              WHEN NOT MATCHED THEN INSERT (k, grp, v) VALUES (s.k, 'm', s.nv)""")
            (lo until lo + n).foreach(k => model(k) = ("m", k * 100 + i))
        }
        if (i % 7 == 0) {
          graft.kv.KvCompactor.compact(dir, targetBytes = 64L << 20, retainInputs = true)
          graft.kv.KvCompactor.vacuum(dir, graceMs = 0L)
          check(s"after maintenance at op $i")
        } else if (i % 5 == 0) check(s"after op $i")
      }
      check("final")
      assert(graft.kv.KvStore.verifyTable(dir) > 0, "fsck after the fuzz run")
    } finally spark.sql("DROP TABLE IF EXISTS graft_fuzzrl")
  }

  test("UPDATE that matches no group is a no-op (no version churn)") {
    val dir = freshTable("graft_updn", rows = 50L, shards = 2)
    try {
      val before = graft.kv.KvStore.readMeta(dir)
      spark.sql("UPDATE graft_updn SET v = 1 WHERE k > 100000")
      val after = graft.kv.KvStore.readMeta(dir)
      assert(after.version == before.version, "no affected groups → no commit")
      assert(after.shards.map(_.file) == before.shards.map(_.file))
    } finally spark.sql("DROP TABLE IF EXISTS graft_updn")
  }
}
