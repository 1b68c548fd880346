package graft.queries

import java.io.File

import com.fasterxml.jackson.databind.ObjectMapper

import graft.{Q, Tables}
import graft.kv.KvStore
import graft.queries.Similarity.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF ANN index — the q53 quantizer's Θ(n^1.25) build paid
  * ONCE per corpus, not per session.
  *
  * [[Similarity.ivfIndex]] / [[Similarity.ivfProbe]] split build from
  * probe, but the split stops at session scope: every new session (or
  * probe batch on another driver) re-assigns the whole corpus before it
  * can probe — at 100 TB the assignment is days of cluster time and the
  * probe is seconds, so an index that cannot outlive its builder is not
  * an index. This store writes the two index relations through the
  * engine's own `graft-kv` source:
  *
  *  - `centroids` (rowkey cid; gid, cemb): the routed fine-centroid
  *    table. The coarse router is BY CONSTRUCTION the prefix cid ≤ c of
  *    the same table (the md5-sample rule), so it is re-derived on load
  *    as a rowkey-range scan rather than persisted twice — the two
  *    copies could otherwise drift.
  *  - `assigned` (rowkey vec_id; embedding, cell): the assigned corpus.
  *
  * plus `_ivfmeta.json` holding the quantizer arithmetic (n, k, c) and a
  * CORPUS FINGERPRINT. The meta write is the commit point: a crash
  * mid-build leaves stale tables but no meta, and the next ensure()
  * rebuilds.
  *
  * Staleness guard: the fingerprint is the corpus file listing —
  * relative path, byte length and mtime of every data file (the same
  * freshness contract snapshot-based table formats pin their manifests
  * to). Checking it is O(#files) metadata stats, NEVER a data scan —
  * the whole point of a persistent index is that probing must not touch
  * the corpus-sized input. [[load]] REFUSES a mismatched corpus with a
  * clear error; [[ensure]] rebuilds instead when
  * `graft.ivfRebuildOnStale=true` (default: also refuse — silently
  * rebuilding a 100 TB index on what may be a misconfigured path is
  * worse than failing).
  *
  * Version pinning rides the KV store's own manifest-version machinery:
  * a rebuild is an overwrite commit on both tables (version bump), so an
  * in-flight reader pinned at the superseded version gets the KV
  * layer's clean time-travel semantics, and `_ivfmeta.json` records the
  * manifest version each table committed at build time.
  */
object IvfStore {

  private val mapper = new ObjectMapper()

  private def centCatalog(name: String) =
    s"""{"table":{"name":"$name"},"rowkey":"cid",
       | "columns":{"cid":{"cf":"rowkey","col":"cid","type":"int"},
       |            "gid":{"cf":"i","col":"g","type":"int"},
       |            "cemb":{"cf":"i","col":"e","type":"array<float>"}}}""".stripMargin

  private def assignedCatalog(name: String) =
    s"""{"table":{"name":"$name"},"rowkey":"vec_id",
       | "columns":{"vec_id":{"cf":"rowkey","col":"vec_id","type":"long"},
       |            "embedding":{"cf":"i","col":"e","type":"array<float>"},
       |            "cell":{"cf":"i","col":"c","type":"int"}}}""".stripMargin

  /** Same corpus-dir cache keying as the KV query tables: basename plus
    * a full-path hash, so same-named corpora never share an index. */
  private def indexRoot(sfDir: String): String = {
    val abs = new File(sfDir).getAbsolutePath
    KvStore.cacheDir(
      s"ivf-${new File(sfDir).getName}-${Integer.toHexString(abs.hashCode)}")
  }

  private def metaFile(root: String) = new File(s"$root/_ivfmeta.json")

  /** Corpus freshness fingerprint: md5 over the sorted
    * (relative path, length, mtime) listing of the embeddings input —
    * file-level metadata only, no data read. Any rewrite, append,
    * repartition or regeneration of the corpus changes it. */
  private[queries] def corpusFingerprint(sfDir: String): String = {
    val base = new File(s"$sfDir/embeddings.parquet")
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val sig = walk(base)
      .map(f => s"${base.toPath.relativize(f.toPath)}:${f.length()}:${f.lastModified()}")
      .mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Build the index from the corpus and commit it: both KV tables, then
    * the meta (the commit point). Returns the loaded index. The whole
    * build runs under the KV layer's cross-process table lock on the
    * index root — two concurrent builders would otherwise interleave
    * their table overwrites and the surviving meta could point at one
    * builder's centroids over the other's assignment. */
  def build(s: SparkSession, sfDir: String): IvfIndex =
    KvStore.withTableLock(indexRoot(sfDir)) { buildLocked(s, sfDir) }

  private def buildLocked(s: SparkSession, sfDir: String): IvfIndex = {
    val root = indexRoot(sfDir)
    val fp = corpusFingerprint(sfDir)
    val idx = Similarity.ivfIndex(s, sfDir)
    val k = idx.nlist
    val c = math.max(4L, math.ceil(math.sqrt(k.toDouble)).toLong)
    // fine-centroid table: k rows, trivially small next to the corpus
    idx.centRouted
      .select(col("cid"), col("gid"), col("cemb"))
      .repartitionByRange(4, col("cid"))
      .write.format("graft-kv")
      .option("catalog", centCatalog("ivf_centroids"))
      .option("path", s"$root/centroids")
      .mode("overwrite").save()
    // assigned corpus: range-partitioned on vec_id for non-overlapping
    // shards (the probe's cell-keyed join reads it shuffled on cell
    // either way; the rowkey layout serves point/range lookups)
    idx.assigned
      .select(col("vec_id"), col("embedding"), col("cell"))
      .repartitionByRange(32, col("vec_id"))
      .write.format("graft-kv")
      .option("catalog", assignedCatalog("ivf_assigned"))
      .option("path", s"$root/assigned")
      .mode("overwrite").save()
    val n = Tables.embeddings(s, sfDir).count()
    val node = mapper.createObjectNode()
    node.put("corpus", new File(sfDir).getAbsolutePath)
    node.put("fingerprint", fp)
    node.put("n", n); node.put("k", k); node.put("c", c)
    node.put("centroidsVersion", KvStore.readMeta(s"$root/centroids").version)
    node.put("assignedVersion", KvStore.readMeta(s"$root/assigned").version)
    val tmp = new File(s"$root/_ivfmeta.json.tmp")
    java.nio.file.Files.write(tmp.toPath,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    java.nio.file.Files.move(tmp.toPath, metaFile(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    load(s, sfDir)
  }

  /** Cold-load the persisted index: meta parse + fingerprint stat + two
    * KV table reads. NO corpus scan, NO assignment work — this is the
    * path a fresh session probes through. Refuses loudly when the
    * corpus has changed since the build or no index exists. */
  def load(s: SparkSession, sfDir: String): IvfIndex = {
    val root = indexRoot(sfDir)
    val mf = metaFile(root)
    if (!mf.exists()) throw new IllegalStateException(
      s"no persisted IVF index for $sfDir (expected ${mf.getPath}); " +
        "run IvfStore.build/ensure first")
    val meta = mapper.readTree(mf)
    val fp = corpusFingerprint(sfDir)
    if (fp != meta.path("fingerprint").asText()) throw new IllegalStateException(
      s"persisted IVF index at $root was built against a different corpus " +
        s"state (fingerprint ${meta.path("fingerprint").asText()} vs current $fp) — " +
        "rebuild with IvfStore.build, or set graft.ivfRebuildOnStale=true " +
        "to let ensure() rebuild automatically")
    val k = meta.path("k").asLong()
    val c = meta.path("c").asLong()
    graft.functions.CosineSimilarity.register(s)
    // pin both reads at the versions THIS build committed (the KV time-
    // travel machinery): a loaded index can never silently mix two
    // builds' states — a concurrent rebuild's truncate-overwrite makes
    // a stale in-flight probe fail with the KV layer's clean
    // "version unavailable" planning error instead of serving rows
    // assigned under one quantizer through another's centroids
    val cent = s.read.format("graft-kv")
      .option("catalog", centCatalog("ivf_centroids"))
      .option("asOfVersion", meta.path("centroidsVersion").asLong())
      .option("path", s"$root/centroids").load()
    val centRouted = cent.select(col("gid"), col("cid"), col("cemb"))
    // the coarse router is the cid ≤ c prefix — a pushed rowkey-range
    // scan of the same table, never a second persisted copy
    val coarse = cent.filter(col("cid") <= c)
      .select(col("cid").as("gid"), col("cemb").as("gemb"))
    val assigned = s.read.format("graft-kv")
      .option("catalog", assignedCatalog("ivf_assigned"))
      .option("asOfVersion", meta.path("assignedVersion").asLong())
      .option("path", s"$root/assigned").load()
      .select(col("vec_id"), col("embedding"), col("cell"))
    IvfIndex(coarse, centRouted, assigned, k)
  }

  /** The build-once contract: load when fresh; build when absent; on a
    * STALE index, refuse unless `graft.ivfRebuildOnStale=true`. */
  def ensure(s: SparkSession, sfDir: String): IvfIndex = {
    val root = indexRoot(sfDir)
    val mf = metaFile(root)
    if (!mf.exists()) return build(s, sfDir)
    val fresh = mapper.readTree(mf).path("fingerprint").asText() ==
      corpusFingerprint(sfDir)
    if (fresh) load(s, sfDir)
    else if (s.conf.get("graft.ivfRebuildOnStale", "false").toBoolean)
      build(s, sfDir)
    else load(s, sfDir) // throws the descriptive staleness error
  }

  /** q115: the SAME adaptive IVF ANN as q53, probed through the
    * PERSISTED index — build-if-absent, then a cold load (meta +
    * fingerprint stat + KV scans) and the probe. The KV round-trip is
    * bit-lossless on float arrays, so the result is identical to q53's
    * and the same full-pipeline oracle hash-checks the entire
    * build → persist → reload → probe path. */
  val q115IvfPersisted: Q = Q(
    "q115_ivf_persisted",
    (s, d) => {
      val idx = ensure(s, d)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.ivfProbe(s, idx, queries, nProbe = 4)
    },
    Some(Similarity.ivfOracleSql),
    doc = "IVF ANN through the persisted (graft-kv) index, cold-loaded")

  def defs: Seq[Q] = Seq(q115IvfPersisted)
}
