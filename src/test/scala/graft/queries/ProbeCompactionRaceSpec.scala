package graft.queries

import java.io.File
import java.nio.file.Files
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import graft.{SparkSpec, Tables}
import graft.kv.KvStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, udf}

/** Reader-vs-maintenance RACE proof (r20): a probe THREAD overlapping a
  * `StreamMaint.maybeCompact` + grace-0 vacuum cycle reads bit-identical
  * rows.
  *
  * StreamMaintCompactSpec proves compaction between batches never
  * changes rows; this spec pins the CONCURRENT claim in
  * `StreamMaint.scala` ("a probe planned mid-compaction keeps replaying
  * its snapshot") at its actual mechanism boundary: a KV scan task opens
  * its shard file at reader CONSTRUCTION (task start), so once every
  * task of the scan stage is active, vacuum's unlink cannot take the
  * data away from it (POSIX unlink-while-open) — and any stage planned
  * AFTER the swap re-reads the live manifest (`KvScan.
  * planInputPartitions` reads `_kvmeta.json` per job) and sees the same
  * rows in merged files. The race is made deterministic with a gate UDF
  * planted right above the scan: every task registers (stage,
  * partition) and blocks on a latch at its first row, the driver waits
  * until the gated stage has ALL its tasks active (files open), runs
  * the full compact + grace-0 vacuum cycle — asserting files really
  * were merged AND reclaimed mid-probe — then opens the latch.
  *
  * The third test pins the contract ERROR for the interleaving the
  * mechanism deliberately does NOT absorb: a reader whose task starts
  * only after its planned shard was vacuumed (grace undercut the scan)
  * must fail with the graft.ivfVacuumGraceMs guidance, not a raw
  * FileNotFoundException (`KvStore.ShardReader` open site). */
class ProbeCompactionRaceSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private val Slices = 3

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"pcr-$tag").toString + "/t"

  private def liveShards(dir: String): Int =
    KvStore.readMeta(dir).shards.length

  private def kvFiles(dir: String): Int =
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .count(_.getName.endsWith(".kv"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Gate UDF: true for every row, but the first row of each task
    * registers the task and then blocks until the driver opens the
    * latch. Nondeterministic so Catalyst can neither constant-fold the
    * zero-arg call nor push it into the source — it stays a Filter in
    * the scan stage, which is exactly where the race must be held. */
  private def gateUdf() =
    udf(() => ProbeCompactionRaceSpec.enter()).asNondeterministic()

  /** Block until SOME gated stage has every one of its tasks actively
    * inside the gate — each of them constructed its ShardReader (file
    * open) before its first row reached the UDF. */
  private def awaitGatedStage(): Unit = {
    val t0 = System.currentTimeMillis()
    while (System.currentTimeMillis() - t0 < 60000) {
      val byStage = ProbeCompactionRaceSpec.seen.asScala.toSeq.groupBy(_._1)
      val full = byStage.exists { case (sid, parts) =>
        spark.sparkContext.statusTracker.getStageInfo(sid)
          .exists(si => si.numTasks == parts.size)
      }
      if (full && ProbeCompactionRaceSpec.seen.size() >= 2) return
      Thread.sleep(25)
    }
    fail("gated scan tasks did not all become active in time")
  }

  private def compactAndVacuumNow(dirs: String*): Unit =
    StreamMaint.withConfs(spark,
      "graft.ivfCompactShards" -> "2", "graft.ivfVacuumGraceMs" -> "0") {
      dirs.foreach(StreamMaint.maybeCompact(spark, _))
    }

  /** Stage the BM25 tables as `Slices` single-shard postings appends —
    * a fragmented store (> the test threshold 2) whose gated scan stays
    * within the 4 task slots of the shared local[4] session. */
  private def stageBm25(): (String, String) = {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val n = docs.count()
    val (pDir, lDir) = (tmp("bm25-p"), tmp("bm25-l"))
    (0 until Slices).foreach { i =>
      val sl = docs.filter(col("doc_id") >= n * i / Slices &&
        col("doc_id") < n * (i + 1) / Slices)
      val (p, dl) = Bm25Store.indexRows(sl)
      val mode = if (i == 0) "overwrite" else "append"
      Bm25Store.writePostings(spark, p, pDir, mode, 1)
      Bm25Store.writeDl(spark, dl, lDir, mode)
    }
    (pDir, lDir)
  }

  /** Probe terms every slice's shard can serve rows for (so every gated
    * scan task produces a first row and registers): the highest-df
    * tokens present in ALL slices. */
  private def commonTerms(k: Int): Seq[String] = {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val n = docs.count()
    val toks = Bm25Store.tokensOf(docs)
      .select(col("doc_id"), org.apache.spark.sql.functions.explode(col("t")).as("token"))
      .withColumn("slice", (col("doc_id") * Slices / n).cast("int"))
      .groupBy(col("token"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("slice")).as("slices"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("df"))
      .filter(col("slices") === Slices)
      .orderBy(col("df").desc, col("token"))
      .limit(k)
    toks.collect().map(_.getString(0)).toSeq
  }

  test("BM25 probe racing compact + grace-0 vacuum reads bit-identical rows") {
    val (pDir, lDir) = stageBm25()
    assert(liveShards(pDir) == Slices, "staging must fragment the postings table")
    val terms = commonTerms(4)
    val expected = rows(Bm25Store.probe(spark, pDir, lDir, terms))
    assert(expected.nonEmpty, "the probe under race must return rows")

    ProbeCompactionRaceSpec.reset()
    val gated = Bm25Store.probe(spark, pDir, lDir, terms,
      postingsTap = _.filter(gateUdf()()))
    val fut = Future(rows(gated))
    awaitGatedStage()
    // the cycle runs while the probe's scan tasks hold their fds: files
    // must genuinely merge AND be reclaimed mid-probe, or this spec
    // proves nothing
    compactAndVacuumNow(pDir, lDir)
    assert(liveShards(pDir) < Slices,
      "compaction must have merged the postings shards mid-probe")
    assert(kvFiles(pDir) == liveShards(pDir),
      "grace-0 vacuum must have reclaimed the superseded files mid-probe")
    ProbeCompactionRaceSpec.release()
    val got = Await.result(fut, 120.seconds)
    assert(got == expected,
      "a probe overlapping a compact+vacuum cycle must read its planned snapshot")
    // and a probe planned entirely AFTER the cycle sees the same rows
    assert(rows(Bm25Store.probe(spark, pDir, lDir, terms)) == expected)
  }

  test("raw KV scan racing compact + grace-0 vacuum reads bit-identical rows") {
    val dir = tmp("raw")
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    docs.repartitionByRange(Slices, col("doc_id"))
      .write.format("graft-kv")
      .option("catalog", KvQueries.docsIncCatalogJson).option("path", dir)
      .mode("overwrite").save()
    assert(liveShards(dir) == Slices)
    def scan() = spark.read.format("graft-kv")
      .option("catalog", KvQueries.docsIncCatalogJson).option("path", dir).load()
    val expected = rows(scan())

    ProbeCompactionRaceSpec.reset()
    val fut = Future(rows(scan().filter(gateUdf()())))
    awaitGatedStage()
    compactAndVacuumNow(dir)
    assert(liveShards(dir) < Slices && kvFiles(dir) == liveShards(dir))
    ProbeCompactionRaceSpec.release()
    assert(Await.result(fut, 120.seconds) == expected)
    assert(rows(scan()) == expected)
  }

  test("a reader that lost the race to vacuum fails with the grace contract error") {
    val dir = tmp("late")
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    docs.repartitionByRange(Slices, col("doc_id"))
      .write.format("graft-kv")
      .option("catalog", KvQueries.docsIncCatalogJson).option("path", dir)
      .mode("overwrite").save()
    val planned = KvStore.readMeta(dir).shards // "scan planned here"
    compactAndVacuumNow(dir) // cycle wins: planned files reclaimed
    val gone = planned.find(s => !new File(s"$dir/${s.file}").exists())
    assert(gone.nonEmpty, "vacuum must have reclaimed a planned shard")
    val ex = intercept[IllegalStateException] {
      new KvStore.ShardReader(dir, gone.get)
    }
    assert(ex.getMessage.contains("graft.ivfVacuumGraceMs"),
      s"late readers must get the grace-sizing contract error, got: ${ex.getMessage}")
  }
}

object ProbeCompactionRaceSpec {
  /** (stageId, partitionId) pairs currently blocked inside the gate. */
  val seen: java.util.Set[(Int, Int)] = ConcurrentHashMap.newKeySet[(Int, Int)]()
  @volatile private var go = new CountDownLatch(1)

  def reset(): Unit = { seen.clear(); go = new CountDownLatch(1) }
  def release(): Unit = go.countDown()

  def enter(): Boolean = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) seen.add((tc.stageId(), tc.partitionId())): Unit
    if (!go.await(120, TimeUnit.SECONDS))
      throw new IllegalStateException("ProbeCompactionRaceSpec gate timed out")
    true
  }
}
