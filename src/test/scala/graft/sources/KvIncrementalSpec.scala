package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.kv.{KvCompactor, KvStore}

/** Incremental (append-CDC) reads: `option("sinceVersion", v)` plans
  * only the shards each commit in the window added, by replaying the
  * manifest chain commit-by-commit — complete and non-duplicating even
  * when compaction has since merged new rows into old shards. */
class KvIncrementalSpec extends SparkSpec {

  private val cat =
    """{"table":{"name":"inc"},"rowkey":"k",
      |"columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
      |           "v":{"cf":"c","col":"v","type":"long"}}}""".stripMargin

  private def append(dir: String, lo: Long, hi: Long): Unit = {
    import spark.implicits._
    (lo until hi).map(i => (i, i * 10)).toDF("k", "v")
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .mode("append").save()
  }
  private def readSince(dir: String, v: Long) =
    spark.read.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("sinceVersion", v).load()

  test("sinceVersion serves exactly the appends after the checkpoint") {
    val dir = Files.createTempDirectory("graft-inc").toString
    append(dir, 0, 100)    // version 1
    append(dir, 100, 250)  // version 2
    append(dir, 250, 300)  // version 3
    assert(readSince(dir, 0).count() == 300)
    assert(readSince(dir, 1).select("k").collect().map(_.getLong(0)).sorted.toSeq
      == (100L until 300L))
    assert(readSince(dir, 2).count() == 50)
    assert(readSince(dir, 3).count() == 0)
    // pushdown composes: the delta scan still prunes + filters
    assert(readSince(dir, 1).where("k >= 290").count() == 10)
  }

  test("a bounded (since, asOf] window replays one historical commit") {
    val dir = Files.createTempDirectory("graft-inc-win").toString
    append(dir, 0, 10)   // v1
    append(dir, 10, 30)  // v2
    append(dir, 30, 40)  // v3
    val win = spark.read.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("sinceVersion", 1).option("asOfVersion", 2).load()
    assert(win.select("k").collect().map(_.getLong(0)).sorted.toSeq == (10L until 30L))
  }

  test("compaction cannot lose or duplicate a delta (log replay, not state diff)") {
    val dir = Files.createTempDirectory("graft-inc-compact").toString
    append(dir, 0, 1000)     // v1 (old history)
    append(dir, 1000, 1100)  // v2 (the delta under test)
    // merge EVERYTHING — new rows now live inside a shard tagged with
    // the old lineage (firstVersion = 1); retainInputs keeps the
    // replaced files on the grace clock, time-travel style
    assert(KvCompactor.compact(dir, 1L << 30, retainInputs = true) > 0) // v3
    val merged = KvStore.readMeta(dir)
    assert(merged.shards.exists(_.firstVersion == 1L))
    // a state-diff (current shards with firstVersion > 1) would return
    // NOTHING here; the log replay still serves v2's shards, exactly once
    assert(readSince(dir, 1).select("k").collect().map(_.getLong(0)).sorted.toSeq
      == (1000L until 1100L))
    // and nothing from the maintenance commit itself
    assert(readSince(dir, merged.version).count() == 0)
  }

  test("pushed aggregates honor the incremental window") {
    val dir = Files.createTempDirectory("graft-inc-agg").toString
    append(dir, 0, 500)   // v1
    append(dir, 500, 600) // v2
    val agg = readSince(dir, 1).agg(org.apache.spark.sql.functions.count("*"))
    assert(agg.collect().head.getLong(0) == 100L)
  }

  test("a stream seeded with sinceVersion starts at the CDC checkpoint, not the snapshot") {
    val dir = Files.createTempDirectory("graft-inc-stream").toString
    append(dir, 0, 10)   // v1 — "backfilled" by a batch consumer
    append(dir, 10, 30)  // v2 — also backfilled; batch checkpoint = 2
    append(dir, 30, 40)  // v3 — the tail the stream must pick up
    val q = spark.readStream.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("sinceVersion", 2).load()
      .writeStream.format("memory").queryName("inc_stream_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-inc-ck").toString)
      .start()
    q.processAllAvailable()
    // stream must continue past the seed exactly as a 0-seeded stream would
    append(dir, 40, 45)  // v4, appended mid-stream
    q.processAllAvailable()
    q.stop()
    assert(spark.table("inc_stream_out").select("k")
      .collect().map(_.getLong(0)).sorted.toSeq == (30L until 45L),
      "first micro-batch must be the (2, latest] delta, then live appends")
  }

  test("a stream seeded ahead of the live table fails loudly") {
    val dir = Files.createTempDirectory("graft-inc-stream-bad").toString
    append(dir, 0, 10)   // v1
    val q = spark.readStream.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("sinceVersion", 99).load()
      .writeStream.format("noop")
      .option("checkpointLocation", Files.createTempDirectory("graft-inc-ck2").toString)
      .start()
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(e.getMessage.contains("ahead of the table"),
      s"expected the ahead-of-table guard, got: ${e.getMessage}")
    q.stop()
  }
}
