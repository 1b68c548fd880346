package graft.kv

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction preserves the record multiset while shrinking the shard
  * count — the maintenance loop for chunked / streaming-appended
  * tables. */
class KvCompactorSpec extends SparkSpec {

  private val cat =
    """{"table":{"name":"cp"},"rowkey":"k",
      | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
      |            "v":{"cf":"f","col":"v","type":"string"}}}""".stripMargin

  private def readBack(dir: String) =
    spark.read.format("graft-kv").option("catalog", cat).option("path", dir).load()

  test("compaction merges small sorted runs and preserves every record") {
    val dir = Files.createTempDirectory("graft-kv-compact").toString
    import spark.implicits._
    // two interleaved appends with tiny chunks → many overlapping runs
    def w(ks: Seq[Long], mode: String) =
      ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .option("chunkBytes", "2048").mode(mode).save()
    w(1L to 500L by 2L, "overwrite")   // odd keys
    w(2L to 500L by 2L, "append")      // even keys, ranges interleave
    val before = KvStore.readMeta(dir).shards
    assert(before.length > 4, s"fixture should start fragmented, got ${before.length}")
    val expected = readBack(dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).sortBy(_._1).toSeq

    val written = KvCompactor.compact(dir, targetBytes = 64L << 20)
    assert(written >= 1)
    val after = KvStore.readMeta(dir).shards
    assert(after.length < before.length,
      s"compaction must shrink the shard count (${before.length} -> ${after.length})")
    val got = readBack(dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).sortBy(_._1).toSeq
    assert(got == expected, "record multiset must survive compaction")
    // pruning still works on the merged manifest
    assert(readBack(dir).filter(col("k") <= 10).count() == 10)
    // old shard files are gone
    val live = after.map(_.file).toSet
    before.filterNot(s => live(s.file)).foreach { s =>
      assert(!new java.io.File(s"$dir/${s.file}").exists(), s"stale ${s.file}")
    }
  }

  test("duplicate rowkeys across runs survive compaction as distinct records") {
    val dir = Files.createTempDirectory("graft-kv-compact-dup").toString
    import spark.implicits._
    def w(mode: String) =
      Seq((7L, "first"), (8L, "x")).toDF("k", "v").coalesce(1)
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .mode(mode).save()
    w("overwrite"); w("append")
    assert(readBack(dir).filter(col("k") === 7L).count() == 2)
    KvCompactor.compact(dir, targetBytes = 64L << 20)
    assert(KvStore.readMeta(dir).shards.length == 1)
    assert(readBack(dir).filter(col("k") === 7L).count() == 2,
      "equal-key records are distinct rows and must not be merged away")
  }

  test("retain-mode compaction keeps inputs for in-flight scans; vacuum reclaims them") {
    val dir = Files.createTempDirectory("graft-kv-compact-retain").toString
    import spark.implicits._
    def w(ks: Seq[Long], mode: String) =
      ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .mode(mode).save()
    w(1L to 50L, "overwrite"); w(51L to 100L, "append")
    val before = KvStore.readMeta(dir).shards.map(_.file)
    assert(KvCompactor.compact(dir, 64L << 20, retainInputs = true) == 1)
    // inputs left the manifest but stayed on disk (scan-race safety)
    before.foreach(f => assert(new java.io.File(s"$dir/$f").exists(), s"$f must be retained"))
    assert(readBack(dir).count() == 100L)
    // inside the grace period nothing is reclaimed
    assert(KvCompactor.vacuum(dir, graceMs = 60000L) == 0)
    // after the grace period only unreferenced files go; live shards
    // stay (count includes the archived pre-compaction manifests, which
    // expire on the same clock as the shards their snapshots reference)
    assert(KvCompactor.vacuum(dir, graceMs = 0L) >= before.length)
    before.foreach(f => assert(!new java.io.File(s"$dir/$f").exists()))
    assert(readBack(dir).count() == 100L, "live shards must survive vacuum")
  }

  test("vacuum cutoff is inclusive: a same-millisecond compact+vacuum(0) still reclaims") {
    // retain-mode compaction bumps input mtimes to "now" before its
    // manifest swap; a vacuum(graceMs=0) issued in the SAME millisecond
    // then computes cutoff == mtime. With an exclusive compare this
    // reclaimed nothing (the r12 full-suite flake); the boundary must
    // be inclusive. vacuumAt pins the cutoff exactly, deterministically.
    val dir = Files.createTempDirectory("graft-kv-vacuum-edge").toString
    import spark.implicits._
    def w(ks: Seq[Long], mode: String) =
      ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .option("chunkBytes", "2048").mode(mode).save()
    w(1L to 200L by 2L, "overwrite")
    w(2L to 200L by 2L, "append")
    val before = KvStore.readMeta(dir).shards.map(_.file)
    assert(KvCompactor.compact(dir, 64L << 20, retainInputs = true) >= 1)
    val live = KvStore.readMeta(dir).shards.map(_.file).toSet
    val stale = before.filterNot(live)
    assert(stale.nonEmpty, "retain-mode compaction should leave superseded inputs")
    // cutoff exactly == every stale file's (just-bumped) mtime
    val bumped = stale.map(f => new java.io.File(s"$dir/$f").lastModified()).max
    assert(KvCompactor.vacuumAt(dir, bumped) >= stale.length,
      "a cutoff equal to the bump instant must reclaim the superseded inputs")
    stale.foreach(f => assert(!new java.io.File(s"$dir/$f").exists(), s"stale $f survived"))
    assert(readBack(dir).count() == 200L, "live shards must survive the boundary vacuum")
  }

  test("single-shard and empty groupings are a no-op") {
    val dir = Files.createTempDirectory("graft-kv-compact-noop").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .mode("overwrite").save()
    assert(KvCompactor.compact(dir, 64L << 20) == 0)
    assert(readBack(dir).count() == 1)
  }

  test("end-to-end: append ingest -> compact -> vacuum scans identically to the source parquet") {
    val d = "/root/testdata/sf0.001"
    // q81 builds the appended+compacted+vacuumed table on first touch
    // (its builder REQUIRES the manifest to shrink and vacuum to clean)
    val viaKv = graft.queries.KvQueries.q81KvCompacted.fn(spark, d)
      .collect().map(_.toSeq).toSeq
    val viaParquet = graft.Tables.orders(spark, d)
      .filter(col("o_orderkey") < 100000L && col("o_orderstatus") === "O")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           graft.util.Exact.dsum(col("o_totalprice")).as("sum_price"),
           max(col("o_custkey")).as("max_cust"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toSeq).toSeq
    assert(viaKv == viaParquet,
      "post-maintenance KV scan must agree with the original parquet")
  }

  test("shard checksums: fsck passes on healthy shards, bit-rot fails fsck AND compaction") {
    val dir = Files.createTempDirectory("graft-kv-crc").toString
    import spark.implicits._
    def w(ks: Seq[Long], mode: String) =
      ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .option("chunkBytes", "2048").mode(mode).save()
    w(1L to 400L by 2L, "overwrite")
    w(2L to 400L by 2L, "append")
    val shards = KvStore.readMeta(dir).shards
    assert(shards.forall(_.crc32cHex.nonEmpty), "every written shard records a CRC")
    assert(KvStore.verifyTable(dir) == shards.length)

    // flip one bit in the LAST byte of one shard — always value payload
    // (the record layout ends with value bytes), so the parse stays
    // structurally valid and only the checksum can catch the rot: this
    // tests the CRC itself, not a lucky parse blow-up
    val victim = new java.io.File(s"$dir/${shards.head.file}")
    val raf = new java.io.RandomAccessFile(victim, "rw")
    try {
      raf.seek(victim.length() - 1)
      val b = raf.read()
      raf.seek(victim.length() - 1)
      raf.write(b ^ 0x10)
    } finally raf.close()

    val fsck = intercept[IllegalStateException](KvStore.verifyTable(dir))
    assert(fsck.getMessage.contains(shards.head.file) &&
      fsck.getMessage.contains("corrupt"))
    // compaction must refuse to spread the corruption into a merged
    // shard: the merge reader verifies inline (same pass as the merge
    // read) and throws BEFORE the manifest swap
    val comp = intercept[IllegalStateException](
      KvCompactor.compact(dir, targetBytes = 64L << 20))
    assert(comp.getMessage.contains("corrupt"))
    // the table was left untouched: manifest still lists the original runs
    assert(KvStore.readMeta(dir).shards.map(_.file).toSet == shards.map(_.file).toSet)
  }

  test("snapshot reads: asOfVersion pins a past manifest commit until vacuumed") {
    val dir = Files.createTempDirectory("graft-kv-timetravel").toString
    import spark.implicits._
    def w(ks: Seq[Long], mode: String) =
      ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .mode(mode).save()
    def at(v: Long) = spark.read.format("graft-kv")
      .option("catalog", cat).option("path", dir)
      .option("asOfVersion", v.toString).load()

    w(1L to 100L, "overwrite")   // commit -> version 1
    w(101L to 200L, "append")    // commit -> version 2
    assert(KvStore.readMeta(dir).version == 2)
    assert(readBack(dir).count() == 200)
    assert(at(1).count() == 100, "version 1 must see only the first commit")
    assert(at(1).agg(max($"k")).head().getLong(0) == 100L)
    assert(at(2).count() == 200)

    // retain-mode compaction commits version 3 but keeps input files,
    // so the pre-compaction snapshot stays readable inside the grace
    assert(KvCompactor.compact(dir, targetBytes = 64L << 20, retainInputs = true) >= 1)
    assert(KvStore.readMeta(dir).version == 3)
    assert(at(2).count() == 200, "pre-compaction snapshot readable under retain mode")
    assert(at(1).filter($"k" > 90).count() == 10)
    // pushdown still applies against the pinned manifest
    assert(at(1).filter($"k" === 150L).count() == 0,
      "a key appended after version 1 must be invisible at version 1")

    // vacuum past the grace deletes superseded shards AND archived
    // manifests — history is bounded by the same clock
    KvCompactor.vacuum(dir, graceMs = -1000)
    assert(readBack(dir).count() == 200, "the live table is untouched")
    val e = intercept[Exception](at(1).count())
    assert(e.getMessage != null)
  }

  test("truncate leaves no readable snapshots behind — pinned reads fail at planning") {
    val dir = Files.createTempDirectory("graft-kv-truncsnap").toString
    import spark.implicits._
    def w(ks: Seq[Long], mode: String) =
      ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .mode(mode).save()
    def at(v: Long) = spark.read.format("graft-kv")
      .option("catalog", cat).option("path", dir)
      .option("asOfVersion", v.toString).load()

    w(1L to 100L, "overwrite")   // version 1
    w(101L to 200L, "append")    // version 2 (archives v1)
    w(201L to 250L, "overwrite") // version 3: truncate — deletes v1/v2 shard files
    assert(KvStore.readMeta(dir).version == 3)
    assert(readBack(dir).count() == 50, "live table holds only the truncating write")
    // the immediately-superseded manifest was NOT archived (its shards
    // are gone the instant the truncate commits) → clean planning error
    assert(!new java.io.File(s"$dir/_kvmeta.v2.json").exists(),
      "truncate must not archive a manifest whose shard files it deletes")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    def unavailable(t: Throwable) = causes(t).exists(c =>
      c.getMessage != null && c.getMessage.contains("unavailable"))
    val e2 = intercept[Exception](at(2).count())
    assert(unavailable(e2), s"expected version-unavailable, got: $e2")
    // version 1's archive predates the truncate (written by the append
    // commit) but its shard files are gone too: the pinned scan must
    // fail AT PLANNING with the same clear error, not mid-task with a
    // raw FileNotFoundException
    val e1 = intercept[Exception](at(1).count())
    assert(unavailable(e1), s"expected version-unavailable planning error, got: $e1")
    assert(!causes(e1).exists(_.isInstanceOf[java.io.FileNotFoundException]),
      "pinned read of a truncated version must not surface FileNotFoundException")
  }

  test("a losing concurrent compactor aborts its swap instead of duplicating records") {
    val dir = Files.createTempDirectory("graft-kv-compact-race").toString
    import spark.implicits._
    def w(ks: Seq[Long], mode: String) =
      ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .option("chunkBytes", "2048").mode(mode).save()
    w(1L to 200L by 2L, "overwrite")
    w(2L to 200L by 2L, "append")
    // compactor B reads the manifest and "merges" (simulated by a real
    // extra shard file) ...
    val staleInputs = KvStore.readMeta(dir).shards
    val wtr = new KvStore.ShardWriter(dir, "shard-compact-race-b.kv")
    wtr.append(KvRecord(BytesCodec.encodeKey(
      org.apache.spark.sql.types.LongType, 1L),
      Seq(KvCell("f", "v", "x".getBytes("UTF-8")))))
    val bOutputs = Seq(wtr.close().get)
    // ... meanwhile compactor A wins the race and swaps first
    assert(KvCompactor.compact(dir, targetBytes = 64L << 20) >= 1)
    val afterA = KvStore.readMeta(dir).shards.map(_.file).toSet
    // B's swap must detect its inputs are gone, discard its output, and
    // leave the manifest exactly as A committed it
    assert(KvCompactor.swapCompacted(dir, staleInputs, bOutputs,
      retainInputs = false) == 0)
    assert(KvStore.readMeta(dir).shards.map(_.file).toSet == afterA,
      "a losing compactor must not touch the manifest")
    assert(!new java.io.File(s"$dir/shard-compact-race-b.kv").exists(),
      "the losing compactor's output file must be cleaned up")
    assert(readBack(dir).count() == 200L, "no duplicated records")
  }

  test("fsck detects EVERY single-bit flip (CRC32C property, randomized positions)") {
    val dir = Files.createTempDirectory("graft-kv-crcprop").toString
    import spark.implicits._
    (1L to 200L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .mode("overwrite").save()
    val shard = KvStore.readMeta(dir).shards.head
    val path = java.nio.file.Paths.get(s"$dir/${shard.file}")
    val clean = java.nio.file.Files.readAllBytes(path)
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { i =>
      val at = rnd.nextInt(clean.length)
      val bit = 1 << rnd.nextInt(8)
      val rotted = clean.clone()
      rotted(at) = (rotted(at) ^ bit).toByte
      java.nio.file.Files.write(path, rotted)
      val e = intercept[IllegalStateException](KvStore.verifyShard(dir, shard))
      assert(e.getMessage.contains("corrupt"), s"flip #$i at byte $at bit $bit undetected")
    }
    java.nio.file.Files.write(path, clean) // restore → healthy again
    assert(KvStore.verifyTable(dir) == KvStore.readMeta(dir).shards.length)
  }

  test("archived manifest history is bounded — a commit-per-epoch sink cannot leak files") {
    val dir = Files.createTempDirectory("graft-kv-archcap").toString
    val commits = KvStore.MaxArchivedManifests + 10
    (1 to commits).foreach { _ =>
      // the same read-modify-write shape every writer commit uses
      KvStore.withTableLock(dir) {
        val prev =
          if (new java.io.File(KvStore.metaPath(dir)).exists()) KvStore.readMeta(dir)
          else KvTableMeta(Nil)
        KvStore.writeMeta(dir, prev)
      }
    }
    assert(KvStore.readMeta(dir).version == commits)
    val archives = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("_kvmeta.v") && f.getName.endsWith(".json"))
    assert(archives <= KvStore.MaxArchivedManifests,
      s"$archives archived manifests exceed the ${KvStore.MaxArchivedManifests} cap")
    // the most recent history is the part retained
    assert(new java.io.File(s"$dir/_kvmeta.v${commits - 1}.json").exists())
    assert(!new java.io.File(s"$dir/_kvmeta.v1.json").exists())
  }

  test("a streaming read rejects asOfVersion instead of silently tailing the live table") {
    val dir = Files.createTempDirectory("graft-kv-streampin").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .mode("overwrite").save()
    val e = intercept[Exception] {
      spark.readStream.format("graft-kv")
        .option("catalog", cat).option("path", dir)
        .option("asOfVersion", "1").load()
        .writeStream.format("memory").queryName("pin_reject")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        .processAllAvailable()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("asOfVersion is a batch-read option")))
  }

  test("legacy manifests without checksums verify as a no-op (forward compatible)") {
    val dir = Files.createTempDirectory("graft-kv-legacy").toString
    import spark.implicits._
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .mode("overwrite").save()
    // simulate a pre-CRC manifest
    val meta = KvStore.readMeta(dir)
    KvStore.writeMeta(dir,
      meta.copy(shards = meta.shards.map(_.copy(crc32cHex = ""))))
    assert(KvStore.verifyTable(dir) == 0, "no CRC recorded -> nothing verified, no failure")
    assert(readBack(dir).count() == 100L)
  }
}
