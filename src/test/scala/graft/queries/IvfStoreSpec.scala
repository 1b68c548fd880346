package graft.queries

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistent IVF index: cold-loaded probes must equal in-session
  * probes bit-for-bit, and the staleness guard must catch any corpus
  * change without ever scanning corpus data. */
class IvfStoreSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** A private corpus copy this suite can mutate: the staleness tests
    * must never touch the shared driver corpus. */
  private def copyCorpus(): String = {
    val dir = Files.createTempDirectory("ivf-corpus").toString
    Files.copy(Paths.get(s"$d/embeddings.parquet"),
      Paths.get(s"$dir/embeddings.parquet"),
      StandardCopyOption.COPY_ATTRIBUTES)
    dir
  }

  private def queriesDf(dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  test("cold-loaded persisted index probes identically to the in-session index") {
    val idxMem = Similarity.ivfIndex(spark, d)
    val inMem = Similarity.ivfProbe(spark, idxMem, queriesDf(d), nProbe = 4)
    val idxCold = IvfStore.ensure(spark, d)
    val cold = Similarity.ivfProbe(spark, idxCold, queriesDf(d), nProbe = 4)
    assert(cold.except(inMem).count() == 0 && inMem.except(cold).count() == 0,
      "persisted-index probe diverged from the in-session probe")
    assert(cold.count() > 0)
  }

  test("load refuses when no index exists") {
    val corpus = copyCorpus()
    val e = intercept[IllegalStateException](IvfStore.load(spark, corpus))
    assert(e.getMessage.contains("no persisted IVF index"))
  }

  test("staleness guard: a corpus rewrite is refused, rebuild-on-stale recovers") {
    val corpus = copyCorpus()
    val idx1 = IvfStore.ensure(spark, corpus)
    val n1 = idx1.assigned.count()
    assert(n1 == Tables.embeddings(spark, corpus).count())
    // rewrite the corpus: drop a vector and bump mtime — any real
    // pipeline regeneration changes length and/or mtime the same way
    val dropped = Tables.embeddings(spark, corpus)
      .agg(min(col("vec_id"))).head.getLong(0)
    val emb2 = Tables.embeddings(spark, corpus).filter(col("vec_id") =!= dropped)
    val tmpOut = Files.createTempDirectory("ivf-rewrite").toString
    emb2.coalesce(1).write.mode("overwrite").parquet(s"$tmpOut/embeddings.parquet")
    def rmrf(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(new File(s"$corpus/embeddings.parquet"))
    Files.move(Paths.get(s"$tmpOut/embeddings.parquet"),
      Paths.get(s"$corpus/embeddings.parquet"))
    // default: refuse with the descriptive error (both load and ensure)
    val e = intercept[IllegalStateException](IvfStore.load(spark, corpus))
    assert(e.getMessage.contains("different corpus state"))
    val e2 = intercept[IllegalStateException](IvfStore.ensure(spark, corpus))
    assert(e2.getMessage.contains("different corpus state"))
    // opted in: ensure() rebuilds against the new corpus and the index
    // reflects it (the dropped vector is gone)
    spark.conf.set("graft.ivfRebuildOnStale", "true")
    try {
      val idx2 = IvfStore.ensure(spark, corpus)
      assert(idx2.assigned.count() == n1 - 1)
      assert(idx2.assigned.filter(col("vec_id") === dropped).count() == 0)
      // the pre-rebuild index was version-pinned: after the truncate-
      // overwrite it fails LOUDLY (version unavailable) instead of
      // silently reading the other build's rows
      val e3 = intercept[Exception](idx1.assigned.count())
      assert(e3.getMessage.contains("unavailable"), e3.getMessage)
    } finally spark.conf.unset("graft.ivfRebuildOnStale")
  }

  test("coarse router is the cid-prefix of the persisted centroid table") {
    val idx = IvfStore.ensure(spark, d)
    val c = idx.coarse.count()
    assert(c >= 4 && c <= idx.nlist)
    // every coarse row must be the identically-numbered fine centroid
    val joined = idx.coarse.as("g")
      .join(idx.centRouted.as("f"), col("g.gid") === col("f.cid"))
      .filter(expr("cosine_sim(gemb, cemb)") < 0.999999)
    assert(joined.count() == 0, "coarse router drifted from the fine-centroid prefix")
  }
}
