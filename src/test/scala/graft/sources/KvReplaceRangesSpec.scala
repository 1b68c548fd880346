package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.kv.KvStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range-scoped atomic overwrite (`replaceKeyRanges` + mode overwrite)
  * — Delta's `replaceWhere` on the order-preserving encoded rowkey,
  * with the row-level-DML commit discipline: intersecting shards swap
  * out atomically, replaced files ride the restarted vacuum grace
  * clock, replacement rows never resurface as change-feed adds, and
  * the manifest's rewrite watermark is stamped. */
class KvReplaceRangesSpec extends SparkSpec {

  private val cat =
    """{"table":{"name":"rr"},"rowkey":"k","columns":{
      | "k":{"cf":"rowkey","col":"k","type":"long"},
      | "v":{"cf":"f","col":"v","type":"long"}}}""".stripMargin

  private def freshTable(rows: Long = 1000L, shards: Int = 8): String = {
    val dir = Files.createTempDirectory("graft-kv-rr").toString
    import spark.implicits._
    (1L to rows).map(k => (k, k * 10)).toDF("k", "v")
      .repartitionByRange(shards, col("k"))
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .mode("append").save()
    dir
  }

  private def scan(dir: String): DataFrame =
    spark.read.format("graft-kv").option("catalog", cat).option("path", dir).load()

  private def replace(dir: String, df: DataFrame, ranges: Seq[(Long, Long)],
                      expectedVersion: Long = -1L): Unit = {
    var w = df.repartitionByRange(2, col("k"))
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .option("replaceKeyRanges", KeyRanges.serializeTyped(LongType, ranges))
    if (expectedVersion >= 0) w = w.option("expectedVersion", expectedVersion)
    w.mode("overwrite").save()
  }

  test("predicate-exact replace: rows in ranges swapped, boundary survivors carried") {
    val dir = freshTable()
    val before = KvStore.readMeta(dir)
    import spark.implicits._
    // survivors of [101,300] drop multiples of 3 and bump v
    val survivors = (101L to 300L).filterNot(_ % 3 == 0).map(k => (k, k * 100))
      .toDF("k", "v")
    replace(dir, survivors, Seq((101L, 300L)))
    val after = KvStore.readMeta(dir)
    assert(after.version == before.version + 1)
    assert(after.lastRewriteVersion == after.version,
      "a replace that swapped shards must stamp the rewrite watermark")
    // shards fully outside [101,300] keep their files
    val liveFiles = after.shards.map(_.file).toSet
    val untouched = before.shards.filter { s =>
      !KeyRanges.intersectsShard(
        KeyRanges.parseBounded(KeyRanges.serializeTyped(LongType, Seq((101L, 300L)))),
        s.minKey, s.maxKey)
    }
    assert(untouched.nonEmpty && untouched.forall(s => liveFiles(s.file)))
    // replaced files are dropped from the manifest but stay ON DISK
    // (vacuum grace) so the pre-replace snapshot replays
    val dropped = before.shards.filterNot(s => liveFiles(s.file))
    assert(dropped.nonEmpty)
    assert(dropped.forall(s => new File(s"$dir/${s.file}").exists()))
    // final content: outside region intact, inside region = written set
    val got = scan(dir).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ((1L to 100L) ++ (301L to 1000L)).map(k => k -> k * 10).toMap ++
      (101L to 300L).filterNot(_ % 3 == 0).map(k => k -> k * 100).toMap
    assert(got == want)
    // pre-replace snapshot replays the old state
    val pinned = spark.read.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("asOfVersion", before.version.toString).load()
    assert(pinned.count() == 1000)
    assert(pinned.filter(col("k") === 102L).select("v").head().getLong(0) == 1020L)
    // change-feed: the replace window serves NO adds — replacement rows
    // inherit their inputs' firstVersion, mirroring row-level DML
    val delta = spark.read.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("sinceVersion", before.version.toString).load()
    assert(delta.count() == 0,
      "replacement rows must never resurface as change-feed adds")
  }

  test("an empty replacement is a bulk range delete") {
    val dir = freshTable()
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    replace(dir, empty, Seq((401L, 600L)))
    val got = scan(dir)
    assert(got.count() == 800)
    assert(got.filter(col("k").between(401L, 600L)).count() == 0)
    assert(got.filter(col("k") === 400L).count() == 1)
    assert(got.filter(col("k") === 601L).count() == 1)
    val after = KvStore.readMeta(dir)
    assert(after.lastRewriteVersion == after.version)
    // carried boundary survivors never enter a change-feed window
    val delta = spark.read.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("sinceVersion", (after.version - 1).toString).load()
    assert(delta.count() == 0)
  }

  test("multi-range replace in one atomic commit") {
    val dir = freshTable()
    import spark.implicits._
    val survivors = ((1L to 50L) ++ (901L to 950L)).map(k => (k, -k)).toDF("k", "v")
    replace(dir, survivors, Seq((1L, 50L), (901L, 950L)))
    val got = scan(dir)
    assert(got.count() == 1000)
    assert(got.filter(col("v") < 0).count() == 100)
    assert(got.filter(col("k") === 500L).select("v").head().getLong(0) == 5000L)
  }

  test("a written key outside every range fails the task, not the table") {
    val dir = freshTable()
    val before = KvStore.readMeta(dir)
    import spark.implicits._
    val stray = Seq((101L, 1L), (500L, 2L)).toDF("k", "v") // 500 outside [101,300]
    val e = intercept[Exception] { replace(dir, stray, Seq((101L, 300L))) }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("replaceKeyRanges violation")), e.toString)
    val after = KvStore.readMeta(dir)
    assert(after.version == before.version, "failed replace must not commit")
    assert(scan(dir).count() == 1000)
  }

  test("replaceKeyRanges demands overwrite mode") {
    val dir = freshTable(rows = 10L, shards = 1)
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, 0L)).toDF("k", "v")
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .option("replaceKeyRanges", KeyRanges.serializeTyped(LongType, Seq((1L, 5L))))
        .mode("append").save()
    }
    assert(e.getMessage != null && e.getMessage.contains("overwrite"), e.toString)
  }

  test("expectedVersion fences a concurrent commit") {
    val dir = freshTable(rows = 100L, shards = 2)
    val v0 = KvStore.readMeta(dir).version
    import spark.implicits._
    // a concurrent append lands between the caller's read and its write
    Seq((5000L, 1L)).toDF("k", "v")
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .mode("append").save()
    val e = intercept[Exception] {
      replace(dir, Seq((10L, 0L)).toDF("k", "v"), Seq((1L, 50L)),
        expectedVersion = v0)
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("concurrent modification")), e.toString)
    assert(scan(dir).count() == 101, "fenced replace must not change the table")
  }

  test("replace with no intersecting shard is a plain append of genuine adds") {
    val dir = freshTable(rows = 100L, shards = 2)
    val v0 = KvStore.readMeta(dir).version
    import spark.implicits._
    // keyspace [5000,5010] holds nothing yet
    replace(dir, Seq((5001L, 1L), (5002L, 2L)).toDF("k", "v"), Seq((5000L, 5010L)))
    val after = KvStore.readMeta(dir)
    assert(after.version == v0 + 1)
    assert(after.lastRewriteVersion == 0,
      "nothing was replaced — the watermark must not be stamped")
    val delta = spark.read.format("graft-kv").option("catalog", cat)
      .option("path", dir).option("sinceVersion", v0.toString).load()
    assert(delta.count() == 2, "new-region rows ARE change-feed adds")
    assert(scan(dir).count() == 102)
  }
}
