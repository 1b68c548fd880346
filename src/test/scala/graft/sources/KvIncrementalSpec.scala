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

  test("catch-up deeper than archived-manifest retention (add lineage, r14)") {
    // 70 commits > MaxArchivedManifests (64): the archived chain for the
    // window's oldest versions is GONE (v2..v6 manifests dropped), so the
    // pre-lineage planner could never serve this window — the hard
    // backlog ceiling a 100 TB consumer a weekend behind would hit. The
    // live manifest's add lineage plans it from one parse.
    val dir = Files.createTempDirectory("graft-inc-deep").toString
    (0 until 70).foreach(i => append(dir, i * 10, i * 10 + 10)) // v1..v70
    assert(KvStore.readMeta(dir).version == 70)
    assert(!new java.io.File(s"$dir/_kvmeta.v2.json").exists(),
      "precondition: the old archived chain must actually be gone")
    // batch incremental read across the whole deep window
    assert(readSince(dir, 1).select("k").collect().map(_.getLong(0)).sorted.toSeq
      == (10L until 700L), "deep window must serve v2..v70 exactly once")
    // and the same window as a rate-limited streaming drain
    val q = spark.readStream.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("sinceVersion", 1)
      .option("maxVersionsPerTrigger", 7).load()
      .writeStream.format("memory").queryName("inc_deep_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-inc-deep-ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    assert(spark.table("inc_deep_out").select("k")
      .collect().map(_.getLong(0)).sorted.toSeq == (10L until 700L),
      "rate-limited deep drain must deliver the backlog exactly once")
    assert(batches.length >= 9, s"69 versions / cap 7 must take >= 9 batches, got ${batches.length}")
    // the BYTE cap is the regression that escaped the version-cap test:
    // its admission walk costs out each version as the window (w-1, w],
    // which must resolve against the LIVE manifest's lineage — resolving
    // against manifest(w) needs archives this table no longer has
    val q2 = spark.readStream.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("sinceVersion", 1)
      .option("maxBytesPerTrigger", 4096).load()
      .writeStream.format("memory").queryName("inc_deep_bytes_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-inc-deep-ck2").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(120000))
    q2.stop()
    assert(spark.table("inc_deep_bytes_out").select("k")
      .collect().map(_.getLong(0)).sorted.toSeq == (10L until 700L),
      "byte-capped deep drain must deliver the backlog exactly once")
    // a BRAND-NEW capped consumer (offset 0, no sinceVersion): its first
    // batch would pin the initial snapshot at a version whose archived
    // manifest is dropped — the capping base lifts to the retention
    // floor so it starts anyway and still serves every row exactly once
    // (the lifted snapshot subsumes the pre-floor appends)
    val q3 = spark.readStream.format("graft-kv").option("catalog", cat)
      .option("path", dir)
      .option("maxVersionsPerTrigger", 3).load()
      .writeStream.format("memory").queryName("inc_deep_fresh_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-inc-deep-ck3").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q3.awaitTermination(120000))
    val freshBatches = q3.recentProgress.filter(_.numInputRows > 0)
    q3.stop()
    assert(spark.table("inc_deep_fresh_out").select("k")
      .collect().map(_.getLong(0)).sorted.toSeq == (0L until 700L),
      "a fresh capped consumer of an old table must start at the retention " +
        "floor and reconstruct the full table exactly once")
    assert(freshBatches.length >= 2,
      s"the post-floor tail must still drain rate-limited, got ${freshBatches.length} batches")
  }

  test("deep window survives compaction: retired adds plan what archives no longer can") {
    val dir = Files.createTempDirectory("graft-inc-deep-compact").toString
    (0 until 70).foreach(i => append(dir, i * 10, i * 10 + 10)) // v1..v70
    // merge everything: every delta shard leaves the LIVE set; their
    // entries survive only as manifest-resident retired adds
    assert(KvCompactor.compact(dir, 1L << 30, retainInputs = true) > 0) // v71
    assert(!new java.io.File(s"$dir/_kvmeta.v2.json").exists())
    assert(readSince(dir, 1).select("k").collect().map(_.getLong(0)).sorted.toSeq
      == (10L until 700L),
      "retired original shards must serve the window — the merged shard " +
        "would re-serve v1's rows, a missing one would lose a commit")
    assert(readSince(dir, 71).count() == 0, "the maintenance commit adds nothing")
  }

  test("truncate resets add lineage: an old checkpoint fails loudly, a new one plans") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-inc-trunc").toString
    append(dir, 0, 10)  // v1
    append(dir, 10, 20) // v2
    Seq((1000L, 1L)).toDF("k", "v").write.format("graft-kv")
      .option("catalog", cat).option("path", dir)
      .mode("overwrite").save() // v3: truncate — old shards deleted NOW
    // a consumer checkpointed before the truncate must get the clear
    // contract error (its window's data is gone), never a silent empty
    // or partial delta
    val e = intercept[Exception] { readSince(dir, 1).collect() }
    assert(e.getMessage.contains("unavailable"), e.getMessage)
    // a checkpoint AT the truncate serves the fresh data
    assert(readSince(dir, 2).select("k").collect().map(_.getLong(0)).toSeq
      == Seq(1000L))
  }
}
