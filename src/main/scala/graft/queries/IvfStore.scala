package graft.queries

import java.io.File

import com.fasterxml.jackson.databind.ObjectMapper

import graft.{Q, Tables}
import graft.kv.KvStore
import graft.queries.Similarity.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF ANN index — the q53 quantizer's Θ(n^1.25) build paid
  * ONCE per corpus, not per session, and extended INCREMENTALLY as the
  * corpus appends.
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
  * plus `_ivfmeta.json` holding the quantizer arithmetic (n, k, c), a
  * CORPUS FINGERPRINT, and the corpus FILE LISTING the fingerprint was
  * computed from. The meta write is the commit point: a crash mid-build
  * (or mid-update) leaves the pinned manifest versions untouched, and
  * the next ensure() recovers.
  *
  * Staleness guard: the fingerprint is the corpus file listing —
  * relative path, byte length and mtime of every DATA file (underscore/
  * dot-prefixed marker files like Spark's `_SUCCESS` are not corpus
  * data and are excluded — an append commit rewrites `_SUCCESS`, which
  * must not read as a data rewrite). Checking it is O(#files) metadata
  * stats, NEVER a data scan. Because the listing itself is persisted, a
  * mismatch is CLASSIFIED, not just detected:
  *
  *  - PURE APPEND — every file the index was built from is still
  *    present byte-identical (path, length, mtime) and new files
  *    exist. [[ensure]] applies an APPEND-INCREMENTAL update (default
  *    `graft.ivfIncremental=true`): only the new files' vectors are
  *    read and assigned against the FROZEN centroids, and the result is
  *    append-committed to the `assigned` KV table — update cost is
  *    Θ(delta·(c + k/c)) cosine evaluations, proportional to the delta,
  *    never to the corpus. k/c/centroids do not change, so an
  *    incrementally-extended index drifts from a fresh rebuild only in
  *    quantization QUALITY, bounded by the appended fraction the meta
  *    records (`appendedRows`/`n`, and by bytes vs `baseBytes`); past
  *    `graft.ivfMaxAppendFrac` (default 0.25 by bytes) ensure() demands
  *    a full rebuild instead.
  *  - REWRITE — a built-from file changed or disappeared: assignments
  *    already in the index may describe vectors that no longer exist,
  *    so only a full rebuild is sound. Refused with a rebuild hint
  *    (`graft.ivfRebuildOnStale=true` lets ensure() rebuild; the
  *    default refuses — silently rebuilding a 100 TB index on what may
  *    be a misconfigured path is worse than failing).
  *
  * The incremental contract assumes appended files carry NEW rowkeys
  * (the definition of an append-only corpus); re-introducing an
  * existing vec_id in an appended file is a logical rewrite the
  * file-level guard cannot see, exactly as for any keyed table fed by
  * an append-only log.
  *
  * Version pinning rides the KV store's own manifest-version machinery:
  * `_ivfmeta.json` records the manifest version of each table the index
  * state corresponds to, and [[load]] pins both reads `asOfVersion`
  * there — a loaded index can never mix two builds' states, and a
  * crashed update (KV append committed, meta not) leaves readers pinned
  * at the last consistent pair. ensure() detects that dangling commit
  * (table version ahead of the meta's) and falls back to a full rebuild
  * rather than risk double-appending the delta.
  */
object IvfStore {

  private val mapper = new ObjectMapper()

  private[queries] def centCatalog(name: String) =
    s"""{"table":{"name":"$name"},"rowkey":"cid",
       | "columns":{"cid":{"cf":"rowkey","col":"cid","type":"int"},
       |            "gid":{"cf":"i","col":"g","type":"int"},
       |            "cemb":{"cf":"i","col":"e","type":"array<float>"}}}""".stripMargin

  private[queries] def assignedCatalog(name: String) =
    s"""{"table":{"name":"$name"},"rowkey":"vec_id",
       | "columns":{"vec_id":{"cf":"rowkey","col":"vec_id","type":"long"},
       |            "embedding":{"cf":"i","col":"e","type":"array<float>"},
       |            "cell":{"cf":"i","col":"c","type":"int"}}}""".stripMargin

  /** Same corpus-dir cache keying as the KV query tables: basename plus
    * a full-path hash, so same-named corpora never share an index.
    * Package-visible so the stress harness points at the REAL path
    * instead of re-deriving the formula (which would silently break its
    * built-detection if this keying ever changed). */
  private[graft] def indexRoot(sfDir: String): String = {
    val abs = new File(sfDir).getAbsolutePath
    KvStore.cacheDir(
      s"ivf-${new File(sfDir).getName}-${Integer.toHexString(abs.hashCode)}")
  }

  private[graft] def metaFile(root: String) = new File(s"$root/_ivfmeta.json")

  /** Index-write shard sizing: one shard per ~`graft.ivfShardTargetBytes`
    * (default 128 MiB) of estimated input bytes, floored at the
    * historical small-corpus counts (32 full-corpus / 4 delta) so the
    * committed tier layouts and oracle hashes are unchanged at test
    * scale, and capped defensively. A fixed 32 was right at sf0.1 but
    * would mean ~3 TB shards on a 100 TB corpus; sized by bytes the
    * same corpus gets ~800k shards of ~128 MiB each. */
  private[queries] def indexShards(s: SparkSession, bytes: Long, floor: Int): Int = {
    val target = math.max(1L,
      s.conf.get("graft.ivfShardTargetBytes", (128L << 20).toString).toLong)
    math.max(floor, math.min(1 << 20,
      math.ceil(bytes.toDouble / target).toInt))
  }

  /** Index-table SELF-maintenance: every incremental append/patch adds
    * shards to `assigned`, so over many maintenance cycles the index
    * table fragments without bound. Past `graft.ivfCompactShards`
    * (default 64) live shards, merge back toward the byte-sized target
    * (no floor here — a sub-target index table compacts to one shard)
    * in RETAIN mode, so superseded files stay on the vacuum grace
    * clock and a concurrently pinned load keeps replaying its
    * snapshot, then re-pin `assignedVersion`. Compaction merges files
    * and never touches rows, so probe results are bit-identical.
    *
    * Caller must hold the index-root table lock (the KV-level swap
    * takes the assigned table's own lock — a different key, no
    * nesting). Crash contract: a crash between the compaction swap and
    * the meta re-pin leaves the KV version ahead of the meta — pinned
    * loads keep working (archived manifest + retained files), and the
    * next incremental window's dangling-commit guard answers with a
    * rebuild: sound, never silent. */
  private[queries] def maybeCompactAssigned(s: SparkSession, root: String): Unit = {
    val assignedDir = s"$root/assigned"
    val threshold = s.conf.get("graft.ivfCompactShards", "64").toInt
    val m = KvStore.readMeta(assignedDir)
    if (m.shards.length <= threshold) return
    val totalBytes =
      m.shards.map(sh => new File(s"$assignedDir/${sh.file}").length()).sum
    val desired = indexShards(s, totalBytes, 1)
    val targetBytes = math.max(1L, totalBytes / desired + 1)
    if (graft.kv.KvCompactor.compact(assignedDir, targetBytes,
        retainInputs = true) > 0) {
      val node = mapper.readTree(metaFile(root))
        .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      node.put("assignedVersion", KvStore.readMeta(assignedDir).version)
      writeMetaAtomic(root, node)
      System.err.println(
        s"[graft] IvfStore: compacted the assigned index table at $root " +
          s"(${m.shards.length} shards past graft.ivfCompactShards=$threshold " +
          s"-> ${KvStore.readMeta(assignedDir).shards.length})")
      // opt-in reclamation: without it, retained compaction inputs
      // accumulate one generation per maintenance cycle even though the
      // live manifest stays bounded. The grace period must exceed the
      // longest concurrently pinned load (the standard vacuum
      // discipline); -1 (default) leaves reclamation to the operator.
      // Current loads pin the just-re-pinned version and never replay
      // reclaimed history.
      val grace = s.conf.get("graft.ivfVacuumGraceMs", "-1").toLong
      if (grace >= 0) {
        val reclaimed = graft.kv.KvCompactor.vacuum(assignedDir, grace)
        if (reclaimed > 0) System.err.println(
          s"[graft] IvfStore: vacuumed $reclaimed superseded index files at $root")
      }
    }
  }

  /** The corpus DATA file listing: (relative-path, file) of every file
    * under the embeddings input, skipping underscore/dot-prefixed
    * markers (`_SUCCESS`, `.crc` — the same convention parquet readers
    * use). Sorted, so listings and fingerprints are deterministic. */
  private def corpusDataFiles(sfDir: String): Seq[(String, File)] = {
    val base = new File(s"$sfDir/embeddings.parquet")
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    walk(base)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(f => (base.toPath.relativize(f.toPath).toString, f))
  }

  private def listingEntries(sfDir: String): Seq[String] =
    corpusDataFiles(sfDir).map { case (rel, f) =>
      s"$rel:${f.length()}:${f.lastModified()}"
    }

  /** Corpus freshness fingerprint: md5 over the sorted
    * (relative path, length, mtime) data-file listing — file-level
    * metadata only, no data read. Any rewrite, append, repartition or
    * regeneration of the corpus changes it. */
  private[queries] def corpusFingerprint(sfDir: String): String = md5Of(listingEntries(sfDir))

  private def md5Of(entries: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** How the corpus moved relative to the listing a meta recorded. */
  private[queries] sealed trait CorpusDelta
  private[queries] case object CorpusFresh extends CorpusDelta
  /** Every built-from file intact; `newFiles` appeared. Byte counts are
    * from the listing stats (no scan): `newBytes` = appended since the
    * LAST meta write, `totalBytes` = whole corpus now. */
  private[queries] final case class CorpusAppend(
      newFiles: Seq[File], newBytes: Long, totalBytes: Long) extends CorpusDelta
  private[queries] final case class CorpusRewrite(
      changed: Seq[String], removed: Seq[String]) extends CorpusDelta

  private def classify(meta: com.fasterxml.jackson.databind.JsonNode,
                       sfDir: String): CorpusDelta = {
    val current = corpusDataFiles(sfDir)
    val curEntries = current.map { case (rel, f) =>
      s"$rel:${f.length()}:${f.lastModified()}"
    }
    if (md5Of(curEntries) == meta.path("fingerprint").asText()) return CorpusFresh
    val storedNode = meta.path("files")
    if (!storedNode.isArray)
      // pre-listing meta (or hand-edited): cannot prove pure append —
      // the only sound reading of an unclassifiable mismatch is rewrite
      return CorpusRewrite(Seq("<index predates file-listing metadata>"), Nil)
    import scala.jdk.CollectionConverters._
    val stored = storedNode.elements().asScala.map(_.asText()).toSeq
    def relOf(e: String) = e.substring(0, e.lastIndexOf(':', e.lastIndexOf(':') - 1))
    val curByRel = curEntries.map(e => relOf(e) -> e).toMap
    val changed = stored.filter(e => curByRel.get(relOf(e)).exists(_ != e)).map(relOf)
    val removed = stored.filterNot(e => curByRel.contains(relOf(e))).map(relOf)
    if (changed.nonEmpty || removed.nonEmpty) return CorpusRewrite(changed, removed)
    val storedRels = stored.map(relOf).toSet
    val newFiles = current.filterNot { case (rel, _) => storedRels(rel) }
    // all stored files intact and fingerprint differs ⇒ new files exist
    CorpusAppend(newFiles.map(_._2),
      newBytes = newFiles.map(_._2.length()).sum,
      totalBytes = current.map(_._2.length()).sum)
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
    val files = listingEntries(sfDir)
    val idx = Similarity.ivfIndex(s, sfDir)
    val k = idx.nlist
    val c = math.max(4L, math.ceil(math.sqrt(k.toDouble)).toLong)
    val corpusBytes = corpusDataFiles(sfDir).map(_._2.length()).sum
    // fine-centroid table: k rows — estimated as the k/n slice of the
    // corpus bytes (the embedding dominates a row either way)
    idx.centRouted
      .select(col("cid"), col("gid"), col("cemb"))
      .repartitionByRange(indexShards(s,
        corpusBytes * k / math.max(1L, idx.nVectors), 4), col("cid"))
      .write.format("graft-kv")
      .option("catalog", centCatalog("ivf_centroids"))
      .option("path", s"$root/centroids")
      .mode("overwrite").save()
    // assigned corpus: range-partitioned on vec_id for non-overlapping
    // shards (the probe's cell-keyed join reads it shuffled on cell
    // either way; the rowkey layout serves point/range lookups),
    // shard count sized by corpus bytes (floor 32)
    idx.assigned
      .select(col("vec_id"), col("embedding"), col("cell"))
      .repartitionByRange(indexShards(s, corpusBytes, 32), col("vec_id"))
      .write.format("graft-kv")
      .option("catalog", assignedCatalog("ivf_assigned"))
      .option("path", s"$root/assigned")
      .mode("overwrite").save()
    val n = idx.nVectors
    val node = mapper.createObjectNode()
    node.put("corpus", new File(sfDir).getAbsolutePath)
    node.put("fingerprint", md5Of(files))
    val farr = node.putArray("files")
    files.foreach(farr.add)
    node.put("n", n); node.put("k", k); node.put("c", c)
    node.put("baseN", n)
    node.put("baseBytes", corpusBytes)
    node.put("appendedRows", 0L)
    node.put("centroidsVersion", KvStore.readMeta(s"$root/centroids").version)
    node.put("assignedVersion", KvStore.readMeta(s"$root/assigned").version)
    writeMetaAtomic(root, node)
    loadPinned(s, root, mapper.readTree(metaFile(root)))
  }

  private[queries] def writeMetaAtomic(root: String,
                              node: com.fasterxml.jackson.databind.node.ObjectNode): Unit = {
    val tmp = new File(s"$root/_ivfmeta.json.tmp")
    java.nio.file.Files.write(tmp.toPath,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    java.nio.file.Files.move(tmp.toPath, metaFile(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def staleError(root: String, sfDir: String, delta: CorpusDelta): Nothing =
    delta match {
      case CorpusRewrite(changed, removed) => throw new IllegalStateException(
        s"persisted IVF index at $root was built against a different corpus state: " +
          s"the corpus was REWRITTEN in place (${changed.size} changed, " +
          s"${removed.size} removed data files" +
          (changed ++ removed).take(3).mkString(": ", ", ", "") +
          ") — assignments in the index may describe vectors that no longer " +
          "exist, so a full rebuild is required: run IvfStore.build, or set " +
          "graft.ivfRebuildOnStale=true to let ensure() rebuild automatically")
      case CorpusAppend(newFiles, newBytes, totalBytes) => throw new IllegalStateException(
        s"persisted IVF index at $root was built against a different corpus state: " +
          f"the corpus GREW BY PURE APPEND (${newFiles.size} new data files, " +
          f"${100.0 * newBytes / math.max(1L, totalBytes)}%.1f%% of corpus bytes) — " +
          "ensure() applies an append-incremental update when " +
          "graft.ivfIncremental=true (the default) and the appended fraction " +
          "is within graft.ivfMaxAppendFrac; load() itself never mutates the index")
      case CorpusFresh => throw new IllegalStateException("unreachable: fresh")
    }

  /** Cold-load the persisted index: meta parse + fingerprint stat + two
    * KV table reads. NO corpus scan, NO assignment work — this is the
    * path a fresh session probes through. Refuses loudly when the
    * corpus has changed since the build (saying HOW it changed — pure
    * append vs rewrite) or no index exists; load never mutates. */
  def load(s: SparkSession, sfDir: String): IvfIndex = {
    val root = indexRoot(sfDir)
    val mf = metaFile(root)
    if (!mf.exists()) throw new IllegalStateException(
      s"no persisted IVF index for $sfDir (expected ${mf.getPath}); " +
        "run IvfStore.build/ensure first")
    val meta = mapper.readTree(mf)
    classify(meta, sfDir) match {
      case CorpusFresh => loadPinned(s, root, meta)
      case delta => staleError(root, sfDir, delta)
    }
  }

  private[queries] def loadPinned(s: SparkSession, root: String,
                         meta: com.fasterxml.jackson.databind.JsonNode): IvfIndex = {
    val k = meta.path("k").asLong()
    val c = meta.path("c").asLong()
    graft.functions.CosineSimilarity.register(s)
    // pin both reads at the versions THIS index state committed (the KV
    // time-travel machinery): a loaded index can never silently mix two
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
    IvfIndex(coarse, centRouted, assigned, k, meta.path("n").asLong())
  }

  /** Append-incremental update (caller holds the table lock and has
    * classified the corpus as [[CorpusAppend]]): read ONLY the appended
    * files, assign them against the FROZEN centroids (pinned at the
    * build's manifest version), append-commit to the `assigned` KV
    * table, then advance the meta — fingerprint, listing, counts, and
    * the new assigned version — atomically. Cost ∝ delta, not corpus:
    * the only corpus-sized relations touched are the centroid tables
    * (k rows) and the appended files themselves. */
  private def incrementLocked(s: SparkSession, sfDir: String,
                              app: CorpusAppend): IvfIndex = {
    val root = indexRoot(sfDir)
    val meta = mapper.readTree(metaFile(root))
    val assignedDir = s"$root/assigned"
    // dangling-commit guard: a crashed prior update may have committed
    // the KV append without advancing the meta; appending again would
    // double-insert that delta at the NEW pinned version. The last
    // consistent state is still served (reads pin the meta's versions),
    // and the sound recovery is a full rebuild.
    if (KvStore.readMeta(assignedDir).version != meta.path("assignedVersion").asLong() ||
        KvStore.readMeta(s"$root/centroids").version != meta.path("centroidsVersion").asLong()) {
      System.err.println(
        s"[graft] IvfStore: dangling index commit detected at $root " +
          "(KV table version ahead of _ivfmeta.json — a prior update crashed " +
          "between its KV commit and its meta commit); falling back to a full rebuild")
      return buildLocked(s, sfDir)
    }
    val k = meta.path("k").asLong()
    val frozen = loadPinned(s, root, meta)
    graft.functions.CosineSimilarity.register(s)
    val delta = s.read.parquet(app.newFiles.map(_.getPath): _*)
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val assignedDelta =
      Similarity.assignRouted(delta, frozen.coarse, frozen.centRouted, k)
    assignedDelta
      .select(col("vec_id"), col("embedding"), col("cell"))
      .repartitionByRange(indexShards(s, app.newBytes, 4), col("vec_id"))
      .write.format("graft-kv")
      .option("catalog", assignedCatalog("ivf_assigned"))
      .option("path", assignedDir)
      .mode("append").save()
    // bounded scalar: one count over the DELTA files only
    val deltaRows = delta.count()
    val files = listingEntries(sfDir)
    val node = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    node.put("fingerprint", md5Of(files))
    val farr = node.putArray("files")
    files.foreach(farr.add)
    node.put("n", meta.path("n").asLong() + deltaRows)
    node.put("appendedRows", meta.path("appendedRows").asLong() + deltaRows)
    node.put("assignedVersion", KvStore.readMeta(assignedDir).version)
    writeMetaAtomic(root, node)
    System.err.println(
      s"[graft] IvfStore: appended $deltaRows vectors (${app.newFiles.size} files) " +
        s"to the persisted index at $root against frozen k=$k centroids")
    maybeCompactAssigned(s, root)
    loadPinned(s, root, mapper.readTree(metaFile(root)))
  }

  /** The build-once contract: load when fresh; build when absent;
    * append-incrementally extend on a PURE APPEND within
    * `graft.ivfMaxAppendFrac` (by bytes since the original build);
    * otherwise — rewrite, or drift past the bound — refuse unless
    * `graft.ivfRebuildOnStale=true`. */
  def ensure(s: SparkSession, sfDir: String): IvfIndex =
    KvStore.withTableLock(indexRoot(sfDir)) {
      val root = indexRoot(sfDir)
      val mf = metaFile(root)
      def rebuildOk = s.conf.get("graft.ivfRebuildOnStale", "false").toBoolean
      if (!mf.exists()) buildLocked(s, sfDir)
      else {
        val meta = mapper.readTree(mf)
        classify(meta, sfDir) match {
          case CorpusFresh => loadPinned(s, root, meta)
          case app: CorpusAppend =>
            val incremental =
              s.conf.get("graft.ivfIncremental", "true").toBoolean
            val maxFrac =
              s.conf.get("graft.ivfMaxAppendFrac", "0.25").toDouble
            // cumulative drift since the centroids were FIT, not since
            // the last update — repeated small appends must not sneak
            // past the quality bound the threshold exists to enforce
            val baseBytes = meta.path("baseBytes").asLong()
            val drift =
              (app.totalBytes - baseBytes).toDouble / math.max(1L, app.totalBytes)
            if (!incremental) staleError(root, sfDir, app)
            else if (drift > maxFrac) {
              if (rebuildOk) buildLocked(s, sfDir)
              else throw new IllegalStateException(
                f"persisted IVF index at $root: corpus grew by pure append but the " +
                  f"cumulative appended fraction $drift%.3f (by bytes since the " +
                  f"original build) exceeds graft.ivfMaxAppendFrac=$maxFrac%.2f — " +
                  "the frozen centroids' drift bound is spent; a full rebuild is " +
                  "required (set graft.ivfRebuildOnStale=true to let ensure() " +
                  "rebuild automatically)")
            } else incrementLocked(s, sfDir, app)
          case rw: CorpusRewrite =>
            if (rebuildOk) buildLocked(s, sfDir) else staleError(root, sfDir, rw)
        }
      }
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

  /** q137: BATCHED ANN retrieval through the persisted index — the
    * r18-verdict gap: every prior probe query retrieves for a handful
    * of broadcast exemplars, but a production pipeline retrieves for
    * millions of queries in one plan. [[Similarity.ivfProbeAll]] keeps
    * the query relation distributed (only the centroid tables are
    * broadcast; candidates shuffle once on `cell`; ranking is per-query
    * windows) — no driver loop, no query-side broadcast. 100 query
    * vectors here (5× the exemplar set, enough to hash-pin the
    * per-query fan-out) against the same persisted full-corpus index
    * as q115, replayed by the same full-pipeline oracle widened to
    * `vec_id < 100`. */
  val q137IvfProbeBatch: Q = Q(
    "q137_ivf_probe_batch",
    (s, d) => {
      val idx = ensure(s, d)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 100)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.ivfProbeAll(s, idx, queries, nProbe = 4,
        nQueriesHint = Some(100L)) // vec_id < 100 on a dense 0-based id space
    },
    Some(Similarity.ivfOracleSqlFrom("", "dbl",
      queryPred = "q.vec_id < 100")),
    doc = "batched ANN retrieval: 100 queries through the persisted IVF index in one distributed plan")

  // ---- q116: append-incremental index maintenance, end to end ----

  /** Staged split-corpus root for [[q116IvfIncremental]] (cache-keyed
    * like [[indexRoot]]). Layout: `<root>/corpus/embeddings.parquet`
    * (the staged corpus the index is built over) + `<root>/_staged.json`
    * (records the SOURCE corpus fingerprint and the staging phase). */
  private[graft] def stagedRoot(sfDir: String): String = {
    val abs = new File(sfDir).getAbsolutePath
    KvStore.cacheDir(
      s"ivfinc-${new File(sfDir).getName}-${Integer.toHexString(abs.hashCode)}")
  }

  private[queries] def rmrf(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmrf)
    f.delete(): Unit
  }

  /** Stage the append scenario against the driver corpus, derive the
    * index incrementally, and return it with the staged corpus dir:
    *
    *  1. write the first ⌊9n/10⌋ vectors (by vec_id order) of the
    *     source embeddings as the staged corpus and BUILD the index on
    *     it (centroids are fit on, and only on, this prefix);
    *  2. append the remaining vectors as new parquet files in the same
    *     directory — a pure file-level append, exactly what a corpus
    *     ingest job produces;
    *  3. ensure(): classifies the append, assigns ONLY the delta
    *     against the frozen centroids, append-commits, advances meta.
    *
    * Idempotent and crash-safe: `_staged.json` is written only after
    * the append lands, so a partial staging is wiped and redone; a
    * completed staging short-circuits to a plain fresh load. Keyed on
    * the SOURCE corpus fingerprint, so a driver-side regeneration of
    * the testdata re-stages from scratch. */
  private[queries] def ensureIncrementalStage(
      s: SparkSession, sfDir: String): (IvfIndex, String) = {
    val root = stagedRoot(sfDir)
    val corpus = s"$root/corpus"
    KvStore.withTableLock(root) {
      val srcFp = corpusFingerprint(sfDir)
      val marker = new File(s"$root/_staged.json")
      val staged = marker.exists() && {
        val m = mapper.readTree(marker)
        m.path("sourceFingerprint").asText() == srcFp &&
          m.path("phase").asText() == "appended"
      }
      if (!staged) {
        rmrf(new File(corpus))
        rmrf(new File(indexRoot(corpus)))
        marker.delete()
        val raw = Tables.load(s, sfDir, "embeddings")
        val n = raw.count()
        val n0 = n * 9 / 10
        require(n0 > 0 && n0 < n, s"corpus too small to stage an append split: n=$n")
        // the n0-th smallest vec_id bounds the initial prefix; vec_ids
        // are unique (the corpus rowkey), so `vec_id <= thr` ≡ the
        // first n0 rows in vec_id order — replayed by the oracle as
        // row_number() OVER (ORDER BY vec_id) <= 9·cnt//10
        val thr = raw.select(col("vec_id")).orderBy(col("vec_id"))
          .limit(n0.toInt).agg(max(col("vec_id"))).head().getLong(0)
        raw.filter(col("vec_id") <= thr).coalesce(1)
          .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
        build(s, corpus)
        raw.filter(col("vec_id") > thr).coalesce(1)
          .write.mode("append").parquet(s"$corpus/embeddings.parquet")
        val node = mapper.createObjectNode()
        node.put("sourceFingerprint", srcFp)
        node.put("phase", "appended")
        node.put("thresholdVecId", thr)
        java.nio.file.Files.write(marker.toPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
      }
    }
    // outside the staging lock: ensure takes the index lock itself —
    // first call after staging runs the incremental update, every call
    // thereafter is a fresh pinned load
    (ensure(s, corpus), corpus)
  }

  /** q116's oracle: the SAME full-pipeline IVF replay as q53/q115, with
    * the centroid basis restricted to the pre-append prefix (first
    * ⌊9n/10⌋ vectors by vec_id) — the frozen-centroid semantics of an
    * append-incrementally maintained index. Assignment and rescoring
    * run over the FULL corpus: appended vectors must be probe-visible. */
  private[queries] val incOracleSql: String = Similarity.ivfOracleSqlFrom(
    """
      init AS (
        SELECT vec_id, emb FROM (
          SELECT vec_id, emb,
                 row_number() OVER (ORDER BY vec_id) AS rn,
                 count(*) OVER () AS cnt
          FROM dbl) t
        WHERE rn <= cnt * 9 // 10),""", "init")

  /** q116: IVF ANN through an index that was BUILT on 90% of the corpus
    * and append-incrementally EXTENDED with the rest — the maintenance
    * path a 100 TB corpus actually exercises (re-assigning only the
    * ingested delta instead of re-paying the Θ(n^1.25) build). The
    * probe result is hash-checked against a DuckDB replay of the
    * frozen-centroid pipeline, so build → append → incremental-assign →
    * append-commit → pinned reload → probe is oracle-green end to end. */
  val q116IvfIncremental: Q = Q(
    "q116_ivf_incremental",
    (s, d) => {
      val (idx, _) = ensureIncrementalStage(s, d)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.ivfProbe(s, idx, queries, nProbe = 4)
    },
    Some(incOracleSql),
    doc = "IVF ANN through an append-incrementally maintained persisted index")

  // ---- q133: streaming index maintenance (the q132 pattern, dense arm) ----

  private[graft] val feedCatalog =
    """{"table":{"name":"emb_feed"},"rowkey":"vec_id",
      | "columns":{"vec_id":{"cf":"rowkey","col":"vec_id","type":"long"},
      |            "embedding":{"cf":"f","col":"e","type":"array<float>"}}}""".stripMargin

  private[graft] def streamRoot(sfDir: String): String = {
    val abs = new File(sfDir).getAbsolutePath
    KvStore.cacheDir(
      s"ivfstream-${new File(sfDir).getName}-${Integer.toHexString(abs.hashCode)}")
  }

  /** Stage q133's scenario once per corpus: seed = the same 90% prefix
    * q116 uses (so [[incOracleSql]] pins both), the seed-built index at
    * `indexRoot(corpus)` (corpus dir holds ONLY the seed, so loads stay
    * fingerprint-fresh while the index grows through the stream), a
    * PRISTINE SNAPSHOT of that seed index at `$root/index-seed` (q133
    * restores it before every timed drain, so each drain does real
    * tail appends instead of being absorbed by a prior drain's
    * frontier), and the FEED — a versioned KV table, v1 = seed
    * snapshot, v2–v4 = the tail in three ascending vec_id slices. */
  private def ensureStreamStage(s: SparkSession, sfDir: String): String = {
    val root = streamRoot(sfDir)
    val corpus = s"$root/corpus"
    KvStore.withTableLock(root) {
      val srcFp = corpusFingerprint(sfDir)
      val marker = new File(s"$root/_staged.json")
      val staged = marker.exists() &&
        mapper.readTree(marker).path("sourceFingerprint").asText() == srcFp &&
        metaFile(s"$root/index-seed").exists()
      if (!staged) {
        rmrf(new File(root))
        new File(root).mkdirs()
        val raw = Tables.load(s, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
        val n = raw.count()
        val n0 = n * 9 / 10
        require(n0 > 0 && n0 + 3 <= n, s"corpus too small to stage a 3-batch tail: n=$n")
        def thAt(m: Long): Long = raw.select(col("vec_id"))
          .orderBy(col("vec_id")).limit(m.toInt)
          .agg(max(col("vec_id"))).head().getLong(0)
        val thr = thAt(n0)
        val cuts = Seq(thAt(n0 + (n - n0) / 3), thAt(n0 + 2 * (n - n0) / 3))
        raw.filter(col("vec_id") <= thr).coalesce(1)
          .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
        build(s, corpus) // seed-frozen centroids, seed-only assigned table
        StreamMaint.copyDir(new File(indexRoot(corpus)),
          new File(s"$root/index-seed"))
        def commitFeed(df: DataFrame): Unit =
          df.repartitionByRange(2, col("vec_id"))
            .write.format("graft-kv")
            .option("catalog", feedCatalog).option("path", s"$root/feed")
            .mode("append").save()
        commitFeed(raw.filter(col("vec_id") <= thr))
        commitFeed(raw.filter(col("vec_id") > thr && col("vec_id") <= cuts(0)))
        commitFeed(raw.filter(col("vec_id") > cuts(0) && col("vec_id") <= cuts(1)))
        commitFeed(raw.filter(col("vec_id") > cuts(1)))
        val node = mapper.createObjectNode()
        node.put("sourceFingerprint", srcFp)
        java.nio.file.Files.write(marker.toPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
      }
    }
    root
  }

  /** Marker for [[maintainBatch]]'s crash window: written (with the
    * meta's pinned version) BEFORE the KV append, deleted after the
    * meta advance. Its presence proves a version-ahead `assigned`
    * table is maintainBatch's own half-finished commit — safe to
    * adopt — rather than some other writer's. */
  private[graft] def pendingMarker(root: String): File =
    new File(s"$root/_maint_pending.json")

  /** One micro-batch of dense-index maintenance: assign the batch's
    * vectors PAST the assigned table's pushed `max(vec_id)` frontier
    * against the FROZEN centroids and append-commit, advancing the
    * meta's pinned version (the [[q116IvfIncremental]] update, per
    * micro-batch). The frontier filter is the replay discipline — a
    * re-delivered batch appends nothing. Returns the rows indexed.
    *
    * Crash window (r18): the KV append and the meta advance are two
    * commits, and the frontier read is PINNED at the meta's version —
    * a crash between them would leave the appended rows invisible to
    * the replayed batch's frontier, so replay would append them AGAIN
    * (duplicate vec_ids at the new version). maintainBatch therefore
    * brackets its append with [[pendingMarker]]: on entry, a KV
    * version ahead of the meta WITH a marker matching the meta's
    * version is adopted — the orphan commit is maintainBatch's own
    * frontier-filtered, frozen-centroid append, so its rows are
    * counted via the lineage-sound `sinceVersion` delta read (a
    * crashed COMPACTION swap adopts as zero rows — delta planning
    * excludes rewrite outputs) and the meta is re-pinned over it.
    * Without a matching marker the orphan's producer is unknown and
    * the conservative [[incrementLocked]] answer stands: full rebuild.
    * `crashAfterAppend` is the crash-window spec's injection point —
    * it returns right after the KV append, exactly the state a real
    * crash leaves. */
  private[graft] def maintainBatch(s: SparkSession, corpus: String,
                                   batch: DataFrame,
                                   crashAfterAppend: Boolean = false): Long =
    KvStore.withTableLock(indexRoot(corpus)) {
      val root = indexRoot(corpus)
      var meta = mapper.readTree(metaFile(root))
      val assignedDir = s"$root/assigned"
      val tableV = KvStore.readMeta(assignedDir).version
      val metaV = meta.path("assignedVersion").asLong()
      if (tableV != metaV) {
        val marker = pendingMarker(root)
        val adoptable = marker.exists() &&
          mapper.readTree(marker).path("assignedVersion").asLong() == metaV
        if (!adoptable) {
          System.err.println(
            s"[graft] IvfStore: dangling index commit at $root with no pending " +
              "marker (an unknown writer advanced the assigned table past the " +
              "meta); falling back to a full rebuild")
          buildLocked(s, corpus)
          meta = mapper.readTree(metaFile(root))
        } else {
          val orphanRows = s.read.format("graft-kv")
            .option("catalog", assignedCatalog("ivf_assigned"))
            .option("path", assignedDir)
            .option("sinceVersion", metaV).option("asOfVersion", tableV)
            .load().count()
          val node = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
          node.put("n", meta.path("n").asLong() + orphanRows)
          node.put("appendedRows", meta.path("appendedRows").asLong() + orphanRows)
          node.put("assignedVersion", tableV)
          writeMetaAtomic(root, node)
          marker.delete()
          meta = mapper.readTree(metaFile(root))
          System.err.println(
            s"[graft] IvfStore: adopted a dangling maintainBatch commit at $root " +
              s"($orphanRows rows, KV v$metaV -> v$tableV) — a prior batch crashed " +
              "between its KV append and its meta advance; replay continues past it")
        }
      } else pendingMarker(root).delete() // stale marker from a pre-append crash
      val frontier = s.read.format("graft-kv")
        .option("catalog", assignedCatalog("ivf_assigned"))
        .option("path", assignedDir)
        .option("asOfVersion", meta.path("assignedVersion").asLong()).load()
        .agg(coalesce(max(col("vec_id")), lit(-1L))).head().getLong(0)
      val fresh = batch.filter(col("vec_id") > frontier)
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      val nFresh = fresh.count()
      if (nFresh > 0) {
        val marker = mapper.createObjectNode()
        marker.put("assignedVersion", meta.path("assignedVersion").asLong())
        java.nio.file.Files.write(pendingMarker(root).toPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(marker))
        val frozen = loadPinned(s, root, meta)
        // register on the BATCH's session, not (only) the outer one:
        // inside a streaming foreachBatch the batch frame belongs to the
        // stream's CLONED session (cloned at stream start, registry
        // copied then), so registering on `s` alone leaves cosine_sim
        // unresolvable in the session that analyzes this plan. The bug
        // was latent — every cold run registered it via the seed build
        // BEFORE the stream cloned — and surfaced the first time q133
        // ran against an already-cached stage (r21, found while
        // profiling; reproduced on the r20 HEAD).
        graft.functions.CosineSimilarity.register(s)
        graft.functions.CosineSimilarity.register(batch.sparkSession)
        Similarity.assignRouted(fresh, frozen.coarse, frozen.centRouted,
            meta.path("k").asLong())
          .select(col("vec_id"), col("embedding"), col("cell"))
          .repartitionByRange(2, col("vec_id"))
          .write.format("graft-kv")
          .option("catalog", assignedCatalog("ivf_assigned"))
          .option("path", assignedDir)
          .mode("append").save()
        // crashAfterAppend: spec-injected crash — KV committed, meta not
        if (!crashAfterAppend) {
          val node = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
          node.put("n", meta.path("n").asLong() + nFresh)
          node.put("appendedRows", meta.path("appendedRows").asLong() + nFresh)
          node.put("assignedVersion", KvStore.readMeta(assignedDir).version)
          writeMetaAtomic(root, node)
          pendingMarker(root).delete()
          maybeCompactAssigned(s, root)
        }
      }
      nFresh
    }

  /** q133: the persisted IVF index maintained BY a micro-batch stream —
    * the dense twin of q132's inverted-index maintenance, composing
    * q126's state-in-the-sink pattern with q116's frozen-centroid
    * append. The staged embedding feed (v1 = seed snapshot, v2–v4 =
    * ascending tail) drains with `maxVersionsPerTrigger = 1` from
    * `sinceVersion = 1`; every batch assigns only vectors past the
    * assigned table's frontier and append-commits through the same
    * meta/versioning discipline as batch maintenance (self-compaction
    * included), so the index stays loadable and version-pinned
    * MID-STREAM. The drained index ≡ q116's append-maintained index —
    * same 90% centroid basis, same assignments — so [[incOracleSql]]
    * pins the probe hash-exactly. Idempotent across invocations: a
    * second drain (fresh checkpoint, every version re-delivered — the
    * lost-checkpoint worst case) is absorbed by the frontier.
    *
    * Each invocation restores the index from the staged pristine seed
    * snapshot first (r19), so the timed drain always performs the real
    * tail appends — without the restore, every repeat after the first
    * measured frontier-absorbed no-ops, understating the maintenance
    * cost the row exists to measure. */
  val q133IvfStream: Q = Q(
    "q133_ivf_stream",
    (s, d) => {
      val root = ensureStreamStage(s, d)
      val corpus = s"$root/corpus"
      rmrf(new File(indexRoot(corpus)))
      StreamMaint.copyDir(new File(s"$root/index-seed"),
        new File(indexRoot(corpus)))
      StreamMaint.drain(s, s"$root/feed", feedCatalog, s"$root/ckpt",
        sinceVersion = Some(1)) { batch =>
        maintainBatch(s, corpus, batch): Unit
      }
      val idx = load(s, corpus)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.ivfProbe(s, idx, queries, nProbe = 4)
    },
    Some(incOracleSql),
    doc = "streaming IVF maintenance: micro-batches append frozen-centroid assignments past the frontier; drained ≡ q116")

  def defs: Seq[Q] =
    Seq(q115IvfPersisted, q116IvfIncremental, q133IvfStream, q137IvfProbeBatch)
}
