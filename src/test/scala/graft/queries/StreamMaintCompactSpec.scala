package graft.queries

import java.io.File
import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** Self-compaction proof for the LIVE-read index stores (r19).
  *
  * [[StreamMaint.maybeCompact]] is wired into every BM25/LSH
  * maintenance append, but with the production threshold (64 shards)
  * no gate-scale drain ever crosses it — so this spec pins the
  * threshold to 2 and the vacuum grace to 0, drains a 10-commit feed
  * (every batch then appends past the threshold → merge-and-swap →
  * immediate reclamation), and asserts the three properties the
  * mechanism claims:
  *
  *  1. the LIVE shard count stays bounded at every batch boundary
  *     (threshold + the batch's own append width), across ≥ 10 batches;
  *  2. grace-0 vacuum reclaims every superseded `.kv` file — the
  *     on-disk data-file count equals the live manifest's;
  *  3. probe/pairs are BIT-IDENTICAL to an uncompacted control drain
  *     of the same feed (compaction merges files, never rows).
  *
  * The control run doubles as the proof that the compacted run's merge
  * actually executed: with the default threshold the same feed leaves
  * a fragmented table, so if maybeCompact were inert the bounded-shard
  * assertion on the compacted run would fail. */
class StreamMaintCompactSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private val Slices = 10
  private val Terms = Seq("table", "vector", "customer", "stream")

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"smc-$tag").toString + "/t"

  /** The corpus staged as `Slices` ascending doc_id append commits —
    * the q126/q132 feed shape, sliced finer so the drain exercises
    * many append→compact→vacuum cycles. */
  private def stageFeed(tag: String): String = {
    val dir = tmp(s"feed-$tag")
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val n = docs.count()
    (0 until Slices).foreach { i =>
      docs.filter(col("doc_id") >= n * i / Slices &&
          col("doc_id") < n * (i + 1) / Slices)
        .repartitionByRange(2, col("doc_id"))
        .write.format("graft-kv")
        .option("catalog", KvQueries.docsIncCatalogJson).option("path", dir)
        .mode("append").save()
    }
    dir
  }

  private def liveShards(dir: String): Int =
    if (!new File(s"$dir/_kvmeta.json").exists()) 0
    else graft.kv.KvStore.readMeta(dir).shards.length

  private def kvFiles(dir: String): Int =
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .count(_.getName.endsWith(".kv"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("BM25 store: every-batch compaction bounds shards, reclaims files, probe bit-identical") {
    val feed = stageFeed("bm25")
    val (pC, lC) = (tmp("bm25-pc"), tmp("bm25-lc"))
    val (pU, lU) = (tmp("bm25-pu"), tmp("bm25-lu"))
    var batches = 0
    var maxLive = 0
    StreamMaint.withConfs(spark,
      "graft.ivfCompactShards" -> "2", "graft.ivfVacuumGraceMs" -> "0") {
      StreamMaint.drain(spark, feed, KvQueries.docsIncCatalogJson,
        tmp("bm25-ck1")) { b =>
        Bm25Store.maintainBatch(spark, b, pC, lC): Unit
        batches += 1
        maxLive = math.max(maxLive, math.max(liveShards(pC), liveShards(lC)))
      }
    }
    // control: production threshold — nothing compacts, the table fragments
    StreamMaint.drain(spark, feed, KvQueries.docsIncCatalogJson,
      tmp("bm25-ck2")) { b => Bm25Store.maintainBatch(spark, b, pU, lU): Unit }
    assert(batches == Slices, s"expected $Slices micro-batches, drained $batches")
    assert(maxLive <= 4, // threshold 2 + the batch's own 2-shard append
      s"live shard count must stay bounded at every batch boundary (saw $maxLive)")
    assert(liveShards(pU) > 2 && liveShards(lU) > 2,
      "the uncompacted control must fragment — otherwise this spec proves nothing")
    assert(kvFiles(pC) == liveShards(pC) && kvFiles(lC) == liveShards(lC),
      "grace-0 vacuum must reclaim every superseded shard file")
    assert(rows(Bm25Store.probe(spark, pC, lC, Terms)) ==
      rows(Bm25Store.probe(spark, pU, lU, Terms)),
      "compaction must merge files, never rows: probes diverged")
  }

  test("LSH store: every-batch compaction bounds shards, reclaims files, pairs bit-identical") {
    val feed = stageFeed("lsh")
    val (bC, lC) = (tmp("lsh-bc"), tmp("lsh-lc"))
    val (bU, lU) = (tmp("lsh-bu"), tmp("lsh-lu"))
    var batches = 0
    var maxLive = 0
    StreamMaint.withConfs(spark,
      "graft.ivfCompactShards" -> "2", "graft.ivfVacuumGraceMs" -> "0") {
      StreamMaint.drain(spark, feed, KvQueries.docsIncCatalogJson,
        tmp("lsh-ck1")) { b =>
        LshStore.maintainBatch(spark, b, bC, lC): Unit
        batches += 1
        maxLive = math.max(maxLive, math.max(liveShards(bC), liveShards(lC)))
      }
    }
    StreamMaint.drain(spark, feed, KvQueries.docsIncCatalogJson,
      tmp("lsh-ck2")) { b => LshStore.maintainBatch(spark, b, bU, lU): Unit }
    assert(batches == Slices, s"expected $Slices micro-batches, drained $batches")
    assert(maxLive <= 6, // threshold 2 + the batch's own 4-shard append
      s"live shard count must stay bounded at every batch boundary (saw $maxLive)")
    assert(liveShards(bU) > 2 && liveShards(lU) > 2,
      "the uncompacted control must fragment — otherwise this spec proves nothing")
    assert(kvFiles(bC) == liveShards(bC) && kvFiles(lC) == liveShards(lC),
      "grace-0 vacuum must reclaim every superseded shard file")
    assert(rows(LshStore.pairs(spark, bC, lC)) ==
      rows(LshStore.pairs(spark, bU, lU)),
      "compaction must merge files, never rows: pair relations diverged")
  }
}
