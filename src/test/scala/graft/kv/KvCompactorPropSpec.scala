package graft.kv

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Test => PropTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for shard compaction — for RANDOM table layouts
  * (shard count, record count, duplicate keys across shards, value
  * sizes, target size, retain mode), compaction must preserve the
  * record multiset exactly, emit internally sorted shards whose
  * manifest ranges are tight, and vacuum must reclaim every
  * unreferenced file while touching nothing live. */
class KvCompactorPropSpec extends AnyFunSuite {

  /** IO-bound property (each case builds a real on-disk table):
    * fewer cases than the pure codec properties, still enough to
    * explore grouping/degenerate layouts. */
  private def check(p: Prop): Unit = {
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  /** (key, single-byte cell values) — a small key domain forces
    * duplicate keys within and across shards. */
  private val recGen: Gen[(Long, List[Int])] = for {
    key <- Gen.chooseNum(-50L, 50L)
    n <- Gen.chooseNum(0, 2)
    cells <- Gen.listOfN(n, Gen.chooseNum(0, 255))
  } yield (key, cells)

  private def toRecord(r: (Long, List[Int])): KvRecord =
    KvRecord(BytesCodec.encodeKey(LongType, r._1),
      r._2.zipWithIndex.map { case (v, i) =>
        KvCell("f", s"c$i", Array(v.toByte))
      }.toIndexedSeq)

  /** Order- and reference-free value representation for multiset
    * comparison. */
  private def repr(r: KvRecord): (String, Seq[(String, String, String)]) =
    (KvStore.toHex(r.key),
      r.cells.map(c => (c.cf, c.qualifier, KvStore.toHex(c.value))))

  private def readShard(dir: String, s: KvShardMeta): Seq[KvRecord] = {
    val rd = new KvStore.ShardReader(dir, s)
    try rd.toList finally rd.close()
  }

  private def readAll(dir: String): Seq[KvRecord] =
    KvStore.readMeta(dir).shards.flatMap(readShard(dir, _))

  test("compaction preserves the multiset, sorts shards, keeps tight ranges; vacuum reclaims exactly the dead files") {
    check(Prop.forAll(
      Gen.chooseNum(2, 6).flatMap(k => Gen.listOfN(k, Gen.listOf(recGen))),
      Gen.chooseNum(200L, 20000L),
      Gen.oneOf(true, false)) { (shardRecs, target, retain) =>
      val dir = Files.createTempDirectory("graft-kv-prop").toString
      val metas = shardRecs.zipWithIndex.flatMap { case (recs, i) =>
        if (recs.isEmpty) None
        else {
          val sorted = recs.map(toRecord)
            .sortWith((a, b) => BytesCodec.compareKeys(a.key, b.key) < 0)
          val w = new KvStore.ShardWriter(dir, f"shard-p$i%05d.kv")
          sorted.foreach(w.append)
          w.close()
        }
      }
      KvStore.writeMeta(dir, KvTableMeta(metas, Nil))
      val before = readAll(dir).map(repr)

      KvCompactor.compact(dir, target, retainInputs = retain)
      if (retain) {
        Thread.sleep(5) // mtime granularity vs the graceMs=0 cutoff
        KvCompactor.vacuum(dir, graceMs = 0L)
      }

      val metaAfter = KvStore.readMeta(dir)
      val after = readAll(dir).map(repr)

      val multisetPreserved =
        before.groupBy(identity).view.mapValues(_.size).toMap ==
          after.groupBy(identity).view.mapValues(_.size).toMap
      val shardsSortedAndTight = metaAfter.shards.forall { s =>
        val rs = readShard(dir, s)
        rs.nonEmpty &&
          rs.sliding(2).forall {
            case Seq(a, b) => BytesCodec.compareKeys(a.key, b.key) <= 0
            case _ => true
          } &&
          java.util.Arrays.equals(rs.head.key, s.minKey) &&
          java.util.Arrays.equals(rs.last.key, s.maxKey) &&
          rs.length == s.rows
      }
      val diskMatchesManifest = {
        val onDisk = Option(new File(dir).listFiles()).getOrElse(Array.empty)
          .map(_.getName).filter(_.endsWith(".kv")).toSet
        if (retain) onDisk == metaAfter.shards.map(_.file).toSet
        else metaAfter.shards.map(_.file).toSet.subsetOf(onDisk)
      }
      multisetPreserved && shardsSortedAndTight && diskMatchesManifest
    })
  }
}
