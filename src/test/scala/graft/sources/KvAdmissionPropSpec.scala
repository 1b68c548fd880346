package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.kv.KvStore
import org.scalacheck.{Gen, Prop, Test => PropTest}

/** Property fuzz over the streaming ADMISSION MATRIX: random commit
  * layouts (version count, rows and value sizes per version) × random
  * cap combinations (maxVersionsPerTrigger on/off, maxBytesPerTrigger
  * on/off at sizes that sometimes bite and sometimes pack) ×
  * `sinceVersion` × random RETENTION TRUNCATION before the stream
  * starts (the r14 retention-floor lift: a fresh capped consumer of a
  * table older than archive retention starts at the oldest retained
  * manifest) × a checkpointed resume with a freshly-appended tail.
  * The pairwise interactions each have a dedicated KvStreamSpec test;
  * this closes the combination space with one model:
  *
  *  - drain completeness / exactly-once: the KV-sink output is exactly
  *    the keys of versions > sinceVersion, before AND after the resume
  *    (a re-served backlog shows as duplicate keys, a skipped version
  *    as missing keys);
  *  - per-batch version cap: every batch admits ≤ cap versions (read
  *    back from the progress offsets, not trusted from the planner);
  *  - per-batch byte cap: every batch's admitted versions' added-shard
  *    bytes fit the cap, OR the batch is a single oversized version
  *    (the progress guarantee — the one documented exception).
  */
class KvAdmissionPropSpec extends SparkSpec {

  private val cat =
    """{"table":{"name":"adm_src"},"rowkey":"k",
      | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
      |            "v":{"cf":"f","col":"v","type":"string"}}}""".stripMargin
  private val outCat = cat.replace("adm_src", "adm_out")

  private case class Layout(versions: List[(Int, Int)], // (rows, valSize)
                            versCap: Int, byteCapKb: Int,
                            since: Int, truncate: Int, tail: List[(Int, Int)])

  private val verGen: Gen[(Int, Int)] = for {
    rows <- Gen.chooseNum(1, 30)
    sz <- Gen.chooseNum(1, 400)
  } yield (rows, sz)

  private val layoutGen: Gen[Layout] = for {
    vs <- Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, verGen))
    vc <- Gen.chooseNum(0, 3)
    bc <- Gen.oneOf(0, 1, 4, 16) // KB; 0 = off
    since <- Gen.oneOf(0, 1)
    // retention truncation BEFORE the stream starts (round 15 — covers
    // the r14 retention-floor lift): delete the archived manifests of
    // versions 1..truncate, as commit-count retention / manifest vacuum
    // would. A fresh capped consumer must then start at the retention
    // floor (snapshot-at-floor subsumes the pre-floor appends) instead
    // of pinning an unreachable archived version; seeded streams plan
    // their windows from the add lineage and are untouched.
    truncate <- Gen.oneOf(0, 0, 1, 2, 5)
    tail <- Gen.chooseNum(0, 2).flatMap(n => Gen.listOfN(n, verGen))
  } yield Layout(vs, vc, bc, since, truncate, tail)

  private def parseVersion(json: String, dflt: Long): Long =
    Option(json).flatMap("\"version\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(_))
      .map(_.group(1).toLong).getOrElse(dflt)

  /** Bytes version w added, straight from the manifest chain — the same
    * accounting the admission path uses, recomputed independently. */
  private def versionBytes(dir: String, w: Long): Long =
    KvStore.deltaShards(dir, w - 1, Some(w))
      .map(sh => new java.io.File(s"$dir/${sh.file}").length()).sum

  test("admission matrix: random layouts x caps x sinceVersion x resume") {
    import spark.implicits._
    val prop = Prop.forAll(layoutGen) { layout =>
      val dir = Files.createTempDirectory("graft-kv-admfuzz").toString
      val outDir = Files.createTempDirectory("graft-kv-admfuzz-out").toString
      val ckpt = Files.createTempDirectory("graft-kv-admfuzz-ckpt").toString
      var nextKey = 0L
      def append(rows: Int, sz: Int): Seq[Long] = {
        val ks = (0 until rows).map(_ => { val k = nextKey; nextKey += 1; k })
        ks.map(k => (k, "x" * sz)).toDF("k", "v").coalesce(1)
          .write.format("graft-kv").option("catalog", cat).option("path", dir)
          .mode("append").save()
        ks
      }
      def drain(): Seq[Long] = {
        var rdr = spark.readStream.format("graft-kv")
          .option("catalog", cat).option("path", dir)
        if (layout.since > 0) rdr = rdr.option("sinceVersion", layout.since)
        if (layout.versCap > 0)
          rdr = rdr.option("maxVersionsPerTrigger", layout.versCap)
        if (layout.byteCapKb > 0)
          rdr = rdr.option("maxBytesPerTrigger", layout.byteCapKb * 1024L)
        val q = rdr.load()
          .writeStream.outputMode("append").format("graft-kv")
          .option("catalog", outCat).option("path", outDir)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(120000), "AvailableNow must self-terminate")
        // the retention floor the stream saw: a fresh (offset-0) capped
        // stream bases its first batch there — the model mirrors the
        // lift exactly (it applies ONLY to the s == 0 start)
        val floorBase = math.max(0L, KvStore.oldestRetainedVersion(dir) - 1)
        // per-batch caps, read back from the committed offsets
        q.recentProgress.filter(_.numInputRows > 0).foreach { pr =>
          val src = pr.sources.head
          val e = parseVersion(src.endOffset, -1L)
          val sRaw = parseVersion(src.startOffset, layout.since.toLong)
          val s = if (sRaw == 0L) floorBase else sRaw
          val nv = e - s
          if (layout.versCap > 0)
            assert(nv <= layout.versCap,
              s"batch ($s, $e] admitted $nv versions > cap ${layout.versCap}")
          if (layout.byteCapKb > 0) {
            val bytes = ((s + 1) to e).map(versionBytes(dir, _)).sum
            assert(bytes <= layout.byteCapKb * 1024L || nv == 1,
              s"batch ($s, $e] admitted $bytes bytes > cap " +
                s"${layout.byteCapKb * 1024L} without being a single version")
          }
        }
        q.stop()
        spark.read.format("graft-kv").option("catalog", outCat)
          .option("path", outDir).load()
          .select("k").collect().map(_.getLong(0)).sorted.toSeq
      }
      val committed = layout.versions.map { case (r, sz) => append(r, sz) }
      // commit-count retention: archived manifests below the cut are
      // gone before the stream ever starts (shard files stay — they are
      // all LIVE-referenced, which is exactly why the snapshot-at-floor
      // start loses nothing)
      (1 to layout.truncate).foreach { v =>
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(s"$dir/_kvmeta.v$v.json")): Unit
      }
      val expected1 = committed.drop(layout.since).flatten.sorted
      val got1 = drain()
      assert(got1 == expected1,
        s"drain served ${got1.length} keys, expected ${expected1.length} " +
          s"(since=${layout.since}, caps=${layout.versCap}/${layout.byteCapKb}KB)")
      val tailKeys = layout.tail.map { case (r, sz) => append(r, sz) }.flatten
      val expected2 = (expected1 ++ tailKeys).sorted
      val got2 = drain()
      assert(got2 == expected2,
        "resumed drain must serve exactly the tail: duplicates mean the " +
          "backlog was re-served, gaps mean a version was skipped")
      true
    }
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
