package graft.queries

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.kv.{KvCompactor, KvStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manifest-native IVF maintenance over a versioned graft-kv corpus:
  * staleness = version compare, append detection = lineage file
  * survival, delta = the engine's own incremental read. */
class IvfKvStoreSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def freshCorpus(): (String, Long) = {
    val dir = Files.createTempDirectory("ivfkv-corpus").toString + "/t"
    val raw = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    raw.repartitionByRange(2, col("vec_id"))
      .write.format("graft-kv")
      .option("catalog", IvfKvStore.corpusCatalog)
      .option("path", dir).mode("append").save()
    (dir, raw.count())
  }

  private def appendRows(dir: String, idOffset: Long, n: Int): Unit =
    Tables.embeddings(spark, d).orderBy(col("vec_id")).limit(n)
      .select((col("vec_id") + idOffset).as("vec_id"), col("embedding"))
      .coalesce(1).write.format("graft-kv")
      .option("catalog", IvfKvStore.corpusCatalog)
      .option("path", dir).mode("append").save()

  private def meta(dir: String) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(new java.io.File(
      s"${IvfKvStore.indexRoot(dir)}/_ivfmeta.json"))
  }

  test("append commits extend the index incrementally via the lineage-planned delta") {
    val (dir, n) = freshCorpus()
    val idx1 = IvfKvStore.ensure(spark, dir)
    assert(idx1.nVectors == n)
    val m1 = meta(dir)
    assert(m1.path("corpusVersion").asLong() == 1)
    // two separate append commits -> one ensure covers the whole window
    appendRows(dir, 500000, 12)
    appendRows(dir, 600000, 8)
    val e = intercept[IllegalStateException](IvfKvStore.load(spark, dir))
    assert(e.getMessage.contains("PURE APPEND"), e.getMessage)
    val idx2 = IvfKvStore.ensure(spark, dir)
    val m2 = meta(dir)
    assert(m2.path("corpusVersion").asLong() == 3)
    assert(m2.path("centroidsVersion").asLong() == m1.path("centroidsVersion").asLong(),
      "incremental update must not touch the centroid table")
    assert(m2.path("appendedRows").asLong() == 20)
    assert(idx2.nVectors == n + 20)
    val got = idx2.assigned.select("vec_id").collect().map(_.getLong(0)).toSet
    val want = spark.read.format("graft-kv")
      .option("catalog", IvfKvStore.corpusCatalog).option("path", dir).load()
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"assigned ids diverge: missing ${want -- got}, stray ${got -- want}")
    // the delta's cells equal a direct frozen-centroid assignment
    val delta: DataFrame = spark.read.format("graft-kv")
      .option("catalog", IvfKvStore.corpusCatalog).option("path", dir)
      .option("sinceVersion", 1).load()
      .select(col("vec_id"), col("embedding"))
    val expected = Similarity
      .assignRouted(delta, idx2.coarse, idx2.centRouted, idx2.nlist)
      .select(col("vec_id"), col("cell"))
    val gotCells = idx2.assigned.filter(col("vec_id") >= 500000)
      .select(col("vec_id"), col("cell"))
    assert(gotCells.except(expected).count() == 0 &&
      expected.except(gotCells).count() == 0)
  }

  test("retain-mode compaction is not a rewrite: empty-delta window just re-pins") {
    val (dir, n) = freshCorpus()
    appendRows(dir, 700000, 10)
    IvfKvStore.ensure(spark, dir) // build at v2
    val m1 = meta(dir)
    assert(KvCompactor.compact(dir, 1L << 30, retainInputs = true) > 0)
    val v = KvStore.readMeta(dir).version
    assert(v == 3)
    val idx = IvfKvStore.ensure(spark, dir)
    val m2 = meta(dir)
    assert(m2.path("corpusVersion").asLong() == v, "ensure must re-pin past the compaction")
    assert(m2.path("assignedVersion").asLong() == m1.path("assignedVersion").asLong(),
      "an empty-delta window must not commit to the index tables")
    assert(m2.path("appendedRows").asLong() == m1.path("appendedRows").asLong())
    assert(idx.nVectors == n + 10)
    // and a further append AFTER the compaction still increments
    appendRows(dir, 800000, 5)
    val idx2 = IvfKvStore.ensure(spark, dir)
    assert(idx2.nVectors == n + 15)
    assert(meta(dir).path("centroidsVersion").asLong() ==
      m1.path("centroidsVersion").asLong())
  }

  test("an overwrite is classified as a rewrite and refused; rebuild-on-stale recovers") {
    val (dir, n) = freshCorpus()
    IvfKvStore.ensure(spark, dir)
    // truncate-overwrite: replaces every shard (drop one vector)
    val kept = Tables.embeddings(spark, d).filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    kept.repartitionByRange(2, col("vec_id"))
      .write.format("graft-kv")
      .option("catalog", IvfKvStore.corpusCatalog)
      .option("path", dir).mode("overwrite").save()
    val e = intercept[IllegalStateException](IvfKvStore.ensure(spark, dir))
    assert(e.getMessage.contains("NOT a pure append"), e.getMessage)
    val e2 = intercept[IllegalStateException](IvfKvStore.load(spark, dir))
    assert(e2.getMessage.contains("NOT a pure append"), e2.getMessage)
    spark.conf.set("graft.ivfRebuildOnStale", "true")
    try {
      val idx = IvfKvStore.ensure(spark, dir)
      assert(idx.nVectors == n - 1)
      assert(meta(dir).path("appendedRows").asLong() == 0)
    } finally spark.conf.unset("graft.ivfRebuildOnStale")
  }

  test("a row-level DML delete is classified as a rewrite, not a pure append") {
    // Regression: the replaced genuine adds land in retiredAdds (the
    // change-feed planner needs them there), so the file-survival check
    // alone read a DELETE window as a pure append with an EMPTY delta —
    // ensure() silently re-pinned an index still serving deleted rows.
    // The lastRewriteVersion watermark is the fix.
    val (dir, n) = freshCorpus()
    IvfKvStore.ensure(spark, dir)
    spark.sql("DROP TABLE IF EXISTS ivfkv_dml")
    try {
      spark.sql(s"""
        CREATE TABLE ivfkv_dml USING `graft-kv`
        OPTIONS (catalog '${IvfKvStore.corpusCatalog}', path '$dir')""")
      spark.sql("DELETE FROM ivfkv_dml WHERE vec_id % 10 = 3")
      val live = KvStore.readMeta(dir)
      assert(live.lastRewriteVersion == live.version,
        "row-level DML must stamp the rewrite watermark")
      val e = intercept[IllegalStateException](IvfKvStore.ensure(spark, dir))
      assert(e.getMessage.contains("row-level rewrite"), e.getMessage)
      val e2 = intercept[IllegalStateException](IvfKvStore.load(spark, dir))
      assert(e2.getMessage.contains("NOT a pure append"), e2.getMessage)
      val survivors = spark.table("ivfkv_dml").count()
      assert(survivors < n)
      spark.conf.set("graft.ivfRebuildOnStale", "true")
      try assert(IvfKvStore.ensure(spark, dir).nVectors == survivors)
      finally spark.conf.unset("graft.ivfRebuildOnStale")
    } finally spark.sql("DROP TABLE IF EXISTS ivfkv_dml")
  }

  test("row-exact drift bound: appends past graft.ivfMaxAppendFrac refuse") {
    val (dir, _) = freshCorpus()
    IvfKvStore.ensure(spark, dir)
    appendRows(dir, 900000, 10)
    spark.conf.set("graft.ivfMaxAppendFrac", "0.000001")
    try {
      val e = intercept[IllegalStateException](IvfKvStore.ensure(spark, dir))
      assert(e.getMessage.contains("graft.ivfMaxAppendFrac"), e.getMessage)
    } finally spark.conf.unset("graft.ivfMaxAppendFrac")
    // back under the default bound the same window increments fine
    assert(IvfKvStore.ensure(spark, dir).nVectors ==
      Tables.embeddings(spark, d).count() + 10)
  }
}
