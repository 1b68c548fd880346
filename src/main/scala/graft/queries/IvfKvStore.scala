package graft.queries

import java.io.File

import com.fasterxml.jackson.databind.ObjectMapper

import graft.{Q, Tables}
import graft.kv.{BytesCodec, KvStore}
import graft.queries.Similarity.IvfIndex
import graft.sources.KeyRanges
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** [[IvfStore]] for corpora that live IN THE ENGINE — a versioned
  * `graft-kv` table instead of a parquet directory. The index relations
  * and probe path are identical; what changes is the staleness/delta
  * machinery, which gets strictly better because the corpus carries its
  * own manifest history:
  *
  *  - FRESHNESS is one version compare: the meta records the corpus
  *    manifest version the index covers; `corpusVersion == live` is
  *    fresh. No file listing, no mtime heuristics.
  *  - APPEND vs REWRITE is decided from the manifest, not stat calls,
  *    by TWO independent checks. (1) The rewrite watermark: row-level
  *    DML and range replaces stamp [[graft.kv.KvTableMeta.lastRewriteVersion]],
  *    so any rewrite inside (indexed, live] refuses outright — file
  *    survival CANNOT catch this case, because DML-replaced genuine
  *    adds land in `retiredAdds` (the change-feed planner needs them
  *    there to agree with the archived-chain replay) and thus still
  *    "survive" in `shards ++ retiredAdds`. (2) File survival: every
  *    shard of the indexed manifest must still be present in the live
  *    manifest's `shards ++ retiredAdds` — overwrites/truncates and
  *    table replacement drop files; appends and retain-mode
  *    compactions keep them. Re-compacting an already-merged shard
  *    also drops it (merged outputs are not genuine adds), which this
  *    check conservatively reads as a rewrite — refusal, never a
  *    wrong incremental.
  *  - The DELTA is enumerated by the engine itself: a
  *    `sinceVersion`/`asOfVersion` incremental read plans exactly the
  *    shards the window added from the manifest-resident add lineage
  *    (sound under compaction), so the update reads delta rows and
  *    nothing else — the composition the add-lineage work exists for.
  *
  * Same crash contract as [[IvfStore]]: `_ivfmeta.json` is the commit
  * point, reads pin recorded versions, a dangling KV commit triggers a
  * rebuild instead of a double-append. The drift bound is row-exact
  * here (`appendedRows / n` vs `graft.ivfMaxAppendFrac`) because the
  * manifest records row counts — no byte proxy needed. The append-only
  * rowkey contract carries over: re-appending an EXISTING vec_id is a
  * logical update the file-level lineage cannot see.
  */
object IvfKvStore {

  private val mapper = new ObjectMapper()

  /** Catalog of a KV-resident embeddings corpus (vec_id, embedding). */
  private[graft] val corpusCatalog: String =
    """{"table":{"name":"ivf_corpus"},"rowkey":"vec_id",
      | "columns":{"vec_id":{"cf":"rowkey","col":"vec_id","type":"long"},
      |            "embedding":{"cf":"i","col":"e","type":"array<float>"}}}""".stripMargin

  private[graft] def indexRoot(corpusDir: String): String = {
    val abs = new File(corpusDir).getAbsolutePath
    KvStore.cacheDir(
      s"ivfkv-${new File(corpusDir).getName}-${Integer.toHexString(abs.hashCode)}")
  }

  private def metaFile(root: String) = new File(s"$root/_ivfmeta.json")

  private def readCorpus(s: SparkSession, corpusDir: String,
                         asOf: Long, since: Option[Long]): DataFrame = {
    var r = s.read.format("graft-kv")
      .option("catalog", corpusCatalog)
      .option("path", corpusDir)
      .option("asOfVersion", asOf)
    since.foreach(v => r = r.option("sinceVersion", v))
    r.load().select(col("vec_id"), col("embedding"))
  }

  private[queries] sealed trait KvCorpusDelta
  private[queries] case object KvFresh extends KvCorpusDelta
  /** (indexedVersion, liveVersion] is append/compaction-only. */
  private[queries] final case class KvAppend(v0: Long, cur: Long) extends KvCorpusDelta
  private[queries] final case class KvRewrite(v0: Long, cur: Long,
                                              reason: String) extends KvCorpusDelta

  private def classify(corpusDir: String,
                       meta: com.fasterxml.jackson.databind.JsonNode): KvCorpusDelta = {
    val v0 = meta.path("corpusVersion").asLong()
    val live = KvStore.readMeta(corpusDir)
    if (live.version == v0) return KvFresh
    if (live.version < v0)
      return KvRewrite(v0, live.version,
        "corpus manifest version moved BACKWARDS (table replaced?)")
    // Rewrite watermark FIRST: file survival alone cannot catch a
    // row-level DML — the replaced genuine adds land in `retiredAdds`
    // (the change-feed planner needs them there), so the old shard set
    // still "survives" in shards ++ retiredAdds even though logical
    // content changed. The manifest's lastRewriteVersion is the exact
    // signal: any rewrite committed inside (v0, live] means indexed
    // rows may have changed.
    if (live.lastRewriteVersion > v0)
      return KvRewrite(v0, live.version,
        s"a row-level rewrite (DML / range replace) committed at " +
          s"version ${live.lastRewriteVersion} inside the window")
    val old =
      try KvStore.readMetaAsOf(corpusDir, Some(v0))
      catch {
        case e: IllegalArgumentException =>
          return KvRewrite(v0, live.version,
            s"indexed manifest v$v0 is no longer retained (${e.getMessage})")
      }
    val liveFiles = (live.shards ++ live.retiredAdds).map(_.file).toSet
    val gone = old.shards.filterNot(sh => liveFiles(sh.file))
    if (gone.nonEmpty)
      KvRewrite(v0, live.version,
        s"${gone.length} indexed shard(s) were replaced, not appended past " +
          s"(e.g. ${gone.head.file}) — a DML rewrite, overwrite, truncate, or " +
          "re-compaction of merged shards")
    else KvAppend(v0, live.version)
  }

  def build(s: SparkSession, corpusDir: String): IvfIndex =
    KvStore.withTableLock(indexRoot(corpusDir)) { buildLocked(s, corpusDir) }

  /** Live corpus bytes straight from the manifest's shard listing — the
    * write-sizing estimate ([[IvfStore.indexShards]]) without any scan. */
  private def kvShardBytes(dir: String, shards: Seq[graft.kv.KvShardMeta]): Long =
    shards.map(sh => new File(s"$dir/${sh.file}").length()).sum

  private def buildLocked(s: SparkSession, corpusDir: String): IvfIndex = {
    val root = indexRoot(corpusDir)
    val liveMeta = KvStore.readMeta(corpusDir)
    val cur = liveMeta.version
    val corpusBytes = kvShardBytes(corpusDir, liveMeta.shards)
    val idx = Similarity.ivfIndexFrom(s, readCorpus(s, corpusDir, cur, None))
    val k = idx.nlist
    val c = math.max(4L, math.ceil(math.sqrt(k.toDouble)).toLong)
    idx.centRouted
      .select(col("cid"), col("gid"), col("cemb"))
      .repartitionByRange(IvfStore.indexShards(s,
        corpusBytes * k / math.max(1L, idx.nVectors), 4), col("cid"))
      .write.format("graft-kv")
      .option("catalog", IvfStore.centCatalog("ivf_centroids"))
      .option("path", s"$root/centroids")
      .mode("overwrite").save()
    idx.assigned
      .select(col("vec_id"), col("embedding"), col("cell"))
      .repartitionByRange(IvfStore.indexShards(s, corpusBytes, 32),
        col("vec_id"))
      .write.format("graft-kv")
      .option("catalog", IvfStore.assignedCatalog("ivf_assigned"))
      .option("path", s"$root/assigned")
      .mode("overwrite").save()
    val node = mapper.createObjectNode()
    node.put("corpus", new File(corpusDir).getAbsolutePath)
    node.put("corpusVersion", cur)
    node.put("n", idx.nVectors); node.put("k", k); node.put("c", c)
    node.put("baseN", idx.nVectors)
    node.put("appendedRows", 0L)
    node.put("centroidsVersion", KvStore.readMeta(s"$root/centroids").version)
    node.put("assignedVersion", KvStore.readMeta(s"$root/assigned").version)
    IvfStore.writeMetaAtomic(root, node)
    IvfStore.loadPinned(s, root, mapper.readTree(metaFile(root)))
  }

  private def staleError(root: String, delta: KvCorpusDelta): Nothing = delta match {
    case KvRewrite(v0, cur, reason) => throw new IllegalStateException(
      s"persisted IVF index at $root covers corpus manifest v$v0 but the live " +
        s"table is v$cur and the window is NOT a pure append: $reason — " +
        "assignments in the index may describe rows that changed; ensure() " +
        "patches a bounded rewrite window incrementally when " +
        "graft.ivfIncremental=true (the default), otherwise a full rebuild " +
        "is required (IvfKvStore.build, or graft.ivfRebuildOnStale=true)")
    case KvAppend(v0, cur) => throw new IllegalStateException(
      s"persisted IVF index at $root covers corpus manifest v$v0; the live " +
        s"table is v$cur and the window is a PURE APPEND — ensure() applies an " +
        "append-incremental update when graft.ivfIncremental=true (the " +
        "default); load() itself never mutates the index")
    case KvFresh => throw new IllegalStateException("unreachable: fresh")
  }

  /** Read-only pinned load; refuses any corpus movement, naming the
    * classification. */
  def load(s: SparkSession, corpusDir: String): IvfIndex = {
    val root = indexRoot(corpusDir)
    val mf = metaFile(root)
    if (!mf.exists()) throw new IllegalStateException(
      s"no persisted IVF index for KV corpus $corpusDir (expected ${mf.getPath}); " +
        "run IvfKvStore.build/ensure first")
    val meta = mapper.readTree(mf)
    classify(corpusDir, meta) match {
      case KvFresh => IvfStore.loadPinned(s, root, meta)
      case delta => staleError(root, delta)
    }
  }

  private def incrementLocked(s: SparkSession, corpusDir: String,
                              app: KvAppend): IvfIndex = {
    val root = indexRoot(corpusDir)
    val meta = mapper.readTree(metaFile(root))
    if (KvStore.readMeta(s"$root/assigned").version != meta.path("assignedVersion").asLong() ||
        KvStore.readMeta(s"$root/centroids").version != meta.path("centroidsVersion").asLong()) {
      System.err.println(
        s"[graft] IvfKvStore: dangling index commit detected at $root; " +
          "falling back to a full rebuild")
      return buildLocked(s, corpusDir)
    }
    val k = meta.path("k").asLong()
    val frozen = IvfStore.loadPinned(s, root, meta)
    // the engine enumerates the delta: an incremental read of exactly
    // the window (v0, cur], planned from the add lineage — sound under
    // retain-mode compaction, loud (never partial) under vacuum
    val delta = readCorpus(s, corpusDir, asOf = app.cur, since = Some(app.v0))
    val deltaRows = delta.count()
    if (deltaRows == 0L) {
      // compaction-only window: the logical corpus is unchanged — just
      // re-pin the covered version, no assignment, no index commit
      val node = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      node.put("corpusVersion", app.cur)
      IvfStore.writeMetaAtomic(root, node)
      return IvfStore.loadPinned(s, root, mapper.readTree(metaFile(root)))
    }
    val assignedDelta =
      Similarity.assignRouted(delta, frozen.coarse, frozen.centRouted, k)
    // delta bytes from the same lineage-planned shard set the read used
    val deltaBytes = kvShardBytes(corpusDir,
      KvStore.deltaShards(corpusDir, app.v0, Some(app.cur)))
    assignedDelta
      .select(col("vec_id"), col("embedding"), col("cell"))
      .repartitionByRange(IvfStore.indexShards(s, deltaBytes, 4), col("vec_id"))
      .write.format("graft-kv")
      .option("catalog", IvfStore.assignedCatalog("ivf_assigned"))
      .option("path", s"$root/assigned")
      .mode("append").save()
    val node = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    node.put("corpusVersion", app.cur)
    node.put("n", meta.path("n").asLong() + deltaRows)
    node.put("appendedRows", meta.path("appendedRows").asLong() + deltaRows)
    node.put("assignedVersion", KvStore.readMeta(s"$root/assigned").version)
    IvfStore.writeMetaAtomic(root, node)
    System.err.println(
      s"[graft] IvfKvStore: appended $deltaRows vectors (manifest window " +
        s"(${app.v0}, ${app.cur}]) to the persisted index at $root against " +
        s"frozen k=$k centroids")
    IvfStore.maybeCompactAssigned(s, root)
    IvfStore.loadPinned(s, root, mapper.readTree(metaFile(root)))
  }

  /** The TOUCHED KEY REGION of a rewrite window (v0, live]: the union
    * of key ranges of every shard the window removed or created. Any
    * row the window deleted, updated or added has its key inside this
    * region (rows of retained shards are untouched — the KV write
    * contract forbids same-key re-appends, so no live row outside a
    * new file can shadow an old one), and the region is computed from
    * manifests alone, no data scan. Returns the region with the LIVE
    * row counts (region rows to re-assign, total corpus rows); None
    * when v0's manifest is unavailable (history vacuumed / version
    * moved backwards / nothing actually changed) — the caller must
    * fall back to refuse-or-rebuild. */
  private def dmlRegion(corpusDir: String, v0: Long)
      : Option[(Seq[KeyRanges.Range], Long, Long)] = {
    val live = KvStore.readMeta(corpusDir)
    if (live.version <= v0) return None
    val old =
      try KvStore.readMetaAsOf(corpusDir, Some(v0))
      catch { case _: IllegalArgumentException => return None }
    val oldFiles = old.shards.map(_.file).toSet
    val liveFiles = live.shards.map(_.file).toSet
    val touched = old.shards.filterNot(s => liveFiles(s.file)) ++
      live.shards.filterNot(s => oldFiles(s.file))
    if (touched.isEmpty) return None
    val ranges = KeyRanges.normalize(touched.map(s =>
      (Some(s.minKey): KeyRanges.Bound, Some(s.maxKey): KeyRanges.Bound)))
    val regionRows = live.shards
      .filter(s => KeyRanges.intersectsShard(ranges, s.minKey, s.maxKey))
      .map(_.rows).sum
    Some((ranges, regionRows, live.shards.map(_.rows).sum))
  }

  /** The region as a pushable `vec_id` predicate — multi-range rowkey
    * planning prunes the scan to exactly the touched shards. */
  private def regionPredicate(ranges: Seq[KeyRanges.Range]): Column =
    ranges.map {
      case (Some(lo), Some(hi)) =>
        col("vec_id").between(
          BytesCodec.decodeKey(LongType, lo).asInstanceOf[Long],
          BytesCodec.decodeKey(LongType, hi).asInstanceOf[Long])
      case r => throw new IllegalStateException(s"unbounded region range $r")
    }.reduce(_ || _)

  /** DML-incremental maintenance: patch the index through a rewrite
    * window at cost ∝ the TOUCHED REGION, not the corpus.
    *
    * Under frozen centroids the assignment of a row depends on nothing
    * but the row and the centroids, so the correct post-DML state of
    * the assigned table over the touched region is simply
    * `assignRouted(live rows of the region)` — unchanged rows
    * re-derive their identical cells, updated rows get their new
    * cells, deleted rows are absent, added rows appear. One
    * range-pruned scan of the live region, one frozen-centroid
    * assignment, and one `replaceKeyRanges` commit on the assigned
    * table (fenced by `expectedVersion` against concurrent
    * maintainers) — the same primitive the corpus DML itself used.
    *
    * Bounds: region rows / corpus ≤ `graft.ivfMaxDmlFrac` (default
    * 0.5 — past that a full rebuild is the cheaper and better-quality
    * answer), and the EXACT changed-row count (diffed against the
    * pinned v0 region read, cost ∝ region) joins the cumulative
    * centroid-drift budget checked against `graft.ivfMaxAppendFrac`.
    * If v0's shard files are already vacuumed the drift diff falls
    * back to the conservative region row count.
    *
    * Crash contract unchanged: `_ivfmeta.json` is the commit point; a
    * crash after the assigned-table replace but before the meta write
    * leaves a version mismatch that the next ensure() detects and
    * answers with a full rebuild. */
  private def dmlIncrementLocked(s: SparkSession, corpusDir: String,
                                 rw: KvRewrite, rebuildOk: Boolean): IvfIndex = {
    val root = indexRoot(corpusDir)
    val meta = mapper.readTree(metaFile(root))
    val assignedV = KvStore.readMeta(s"$root/assigned").version
    if (assignedV != meta.path("assignedVersion").asLong() ||
        KvStore.readMeta(s"$root/centroids").version != meta.path("centroidsVersion").asLong()) {
      System.err.println(
        s"[graft] IvfKvStore: dangling index commit detected at $root; " +
          "falling back to a full rebuild")
      return buildLocked(s, corpusDir)
    }
    dmlRegion(corpusDir, rw.v0) match {
      case None =>
        if (rebuildOk) buildLocked(s, corpusDir) else staleError(root, rw)
      case Some((ranges, regionRows, liveTotal)) =>
        val maxDml = s.conf.get("graft.ivfMaxDmlFrac", "0.5").toDouble
        val regionFrac = regionRows.toDouble / math.max(1L, liveTotal)
        if (regionFrac > maxDml) {
          if (rebuildOk) return buildLocked(s, corpusDir)
          throw new IllegalStateException(
            f"persisted IVF index at $root: rewrite window (${rw.v0}, ${rw.cur}] " +
              f"touches $regionRows of $liveTotal corpus rows " +
              f"($regionFrac%.3f > graft.ivfMaxDmlFrac=$maxDml%.2f) — a full " +
              "rebuild is cheaper than patching most of the index " +
              "(set graft.ivfRebuildOnStale=true to rebuild automatically)")
        }
        val k = meta.path("k").asLong()
        val frozen = IvfStore.loadPinned(s, root, meta)
        val pred = regionPredicate(ranges)
        val region = readCorpus(s, corpusDir, asOf = rw.cur, since = None)
          .filter(pred)
        // exact centroid-drift contribution: rows of the live region
        // the frozen centroids never saw (changed or added), diffed
        // against the pinned v0 region — cost ∝ region. Vacuumed v0
        // history (manifest archive or shard files — both surface as
        // the KV layer's "unavailable" IllegalArgumentException at
        // planning) degrades to the conservative region row count;
        // anything else (schema error, task failure) is a real bug and
        // must propagate, not be silently converted into drift.
        val changedOrAdded =
          try {
            val oldRegion = readCorpus(s, corpusDir, asOf = rw.v0, since = None)
              .filter(pred)
            region.join(oldRegion, Seq("vec_id", "embedding"), "left_anti").count()
          } catch {
            case e: IllegalArgumentException if e.getMessage != null &&
                e.getMessage.contains("unavailable") =>
              System.err.println(
                s"[graft] IvfKvStore: pinned v${rw.v0} region read unavailable " +
                  s"(${e.getMessage}); using the conservative drift bound " +
                  s"of $regionRows region rows")
              regionRows
          }
        val drift =
          (meta.path("appendedRows").asLong() + changedOrAdded).toDouble /
            math.max(1L, liveTotal)
        val maxFrac = s.conf.get("graft.ivfMaxAppendFrac", "0.25").toDouble
        if (drift > maxFrac) {
          if (rebuildOk) return buildLocked(s, corpusDir)
          throw new IllegalStateException(
            f"persisted IVF index at $root: rewrite window (${rw.v0}, ${rw.cur}] " +
              f"is patchable, but cumulative rows unseen by the frozen centroids " +
              f"reach $drift%.3f of the corpus, past " +
              f"graft.ivfMaxAppendFrac=$maxFrac%.2f — the drift budget is " +
              "spent; full rebuild required (set graft.ivfRebuildOnStale=true)")
        }
        // region bytes ≈ the region's row share of the live corpus bytes
        val liveM = KvStore.readMeta(corpusDir)
        val regionBytes =
          kvShardBytes(corpusDir, liveM.shards) * regionRows /
            math.max(1L, liveTotal)
        Similarity.assignRouted(region, frozen.coarse, frozen.centRouted, k)
          .select(col("vec_id"), col("embedding"), col("cell"))
          .repartitionByRange(IvfStore.indexShards(s, regionBytes, 4),
            col("vec_id"))
          .write.format("graft-kv")
          .option("catalog", IvfStore.assignedCatalog("ivf_assigned"))
          .option("path", s"$root/assigned")
          .option("replaceKeyRanges", KeyRanges.serializeBounded(ranges))
          .option("expectedVersion", assignedV)
          .mode("overwrite").save()
        val node = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
        node.put("corpusVersion", rw.cur)
        node.put("n", liveTotal)
        node.put("appendedRows", meta.path("appendedRows").asLong() + changedOrAdded)
        node.put("assignedVersion", KvStore.readMeta(s"$root/assigned").version)
        IvfStore.writeMetaAtomic(root, node)
        System.err.println(
          s"[graft] IvfKvStore: patched the rewrite window (${rw.v0}, ${rw.cur}] " +
            s"by re-assigning $regionRows region rows ($changedOrAdded changed/" +
            s"added) against frozen k=$k centroids at $root")
        IvfStore.maybeCompactAssigned(s, root)
        IvfStore.loadPinned(s, root, mapper.readTree(metaFile(root)))
    }
  }

  /** Load when fresh; build when absent; append-incrementally extend a
    * pure-append manifest window within `graft.ivfMaxAppendFrac` (by
    * rows since the original build — exact here, the manifest counts
    * rows); DML-incrementally PATCH a rewrite window whose touched
    * region stays within `graft.ivfMaxDmlFrac` (re-assigning only the
    * region against the frozen centroids); otherwise refuse unless
    * `graft.ivfRebuildOnStale=true`. */
  def ensure(s: SparkSession, corpusDir: String): IvfIndex =
    KvStore.withTableLock(indexRoot(corpusDir)) {
      val root = indexRoot(corpusDir)
      val mf = metaFile(root)
      def rebuildOk = s.conf.get("graft.ivfRebuildOnStale", "false").toBoolean
      if (!mf.exists()) buildLocked(s, corpusDir)
      else {
        val meta = mapper.readTree(mf)
        classify(corpusDir, meta) match {
          case KvFresh => IvfStore.loadPinned(s, root, meta)
          case app: KvAppend =>
            val incremental = s.conf.get("graft.ivfIncremental", "true").toBoolean
            val maxFrac = s.conf.get("graft.ivfMaxAppendFrac", "0.25").toDouble
            // row-exact drift from the manifests: rows added since the
            // centroids were fit, over the corpus now (no data scan —
            // shard row counts come from the lineage-enumerated window)
            val deltaRows = KvStore.deltaShards(corpusDir, app.v0, Some(app.cur))
              .map(_.rows).sum
            val total = meta.path("n").asLong() + deltaRows
            val drift =
              (meta.path("appendedRows").asLong() + deltaRows).toDouble /
                math.max(1L, total)
            if (!incremental) staleError(root, app)
            else if (drift > maxFrac) {
              if (rebuildOk) buildLocked(s, corpusDir)
              else throw new IllegalStateException(
                f"persisted IVF index at $root: manifest window (${app.v0}, " +
                  f"${app.cur}] is a pure append but cumulative appended rows " +
                  f"since the original build reach $drift%.3f of the corpus, " +
                  f"past graft.ivfMaxAppendFrac=$maxFrac%.2f — the frozen " +
                  "centroids' drift bound is spent; full rebuild required " +
                  "(set graft.ivfRebuildOnStale=true to rebuild automatically)")
            } else incrementLocked(s, corpusDir, app)
          case rw: KvRewrite =>
            val incremental = s.conf.get("graft.ivfIncremental", "true").toBoolean
            if (incremental) dmlIncrementLocked(s, corpusDir, rw, rebuildOk)
            else if (rebuildOk) buildLocked(s, corpusDir)
            else staleError(root, rw)
        }
      }
    }

  // ---- q117: the whole composition, oracle-checked ----

  private[graft] def stagedRoot(sfDir: String): String = {
    val abs = new File(sfDir).getAbsolutePath
    KvStore.cacheDir(
      s"ivfkvinc-${new File(sfDir).getName}-${Integer.toHexString(abs.hashCode)}")
  }

  /** Stage the driver corpus as a VERSIONED KV TABLE and exercise the
    * manifest-native maintenance path: commit the first ⌊9n/10⌋ vectors
    * (v1), build, append-commit the rest (v2), ensure() — which
    * classifies the manifest window, enumerates the delta via the
    * lineage-planned incremental read, and extends the index. Same
    * idempotence contract as [[IvfStore.ensureIncrementalStage]]. */
  private[queries] def ensureIncrementalStageKv(
      s: SparkSession, sfDir: String): IvfIndex = {
    val root = stagedRoot(sfDir)
    val corpus = s"$root/corpus"
    KvStore.withTableLock(root) {
      val srcFp = IvfStore.corpusFingerprint(sfDir)
      val marker = new File(s"$root/_staged.json")
      val staged = marker.exists() && {
        val m = mapper.readTree(marker)
        m.path("sourceFingerprint").asText() == srcFp &&
          m.path("phase").asText() == "appended"
      }
      if (!staged) {
        IvfStore.rmrf(new File(corpus))
        IvfStore.rmrf(new File(indexRoot(corpus)))
        marker.delete()
        val raw = Tables.embeddings(s, sfDir)
          .select(col("vec_id"), col("embedding"))
        val n = raw.count()
        val n0 = n * 9 / 10
        require(n0 > 0 && n0 < n, s"corpus too small to stage an append split: n=$n")
        val thr = raw.select(col("vec_id")).orderBy(col("vec_id"))
          .limit(n0.toInt).agg(max(col("vec_id"))).head().getLong(0)
        def commit(df: DataFrame): Unit =
          df.repartitionByRange(2, col("vec_id"))
            .write.format("graft-kv")
            .option("catalog", corpusCatalog)
            .option("path", corpus)
            .mode("append").save()
        commit(raw.filter(col("vec_id") <= thr)) // v1
        build(s, corpus)
        commit(raw.filter(col("vec_id") > thr)) // v2 — the append window
        val node = mapper.createObjectNode()
        node.put("sourceFingerprint", srcFp)
        node.put("phase", "appended")
        node.put("thresholdVecId", thr)
        java.nio.file.Files.write(marker.toPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
      }
    }
    ensure(s, corpus)
  }

  /** q117: q116's frozen-centroid semantics with the corpus LIVING IN
    * THE ENGINE — the delta is not a file listing but a lineage-planned
    * incremental read of the manifest window, i.e. the add-lineage/CDC
    * machinery maintaining the ANN index. The KV float round-trip is
    * lossless, so the result is bit-identical to q116's and the SAME
    * DuckDB oracle (centroid basis = pre-append 90% prefix) hash-checks
    * commit → build → append-commit → lineage-delta assign → probe. */
  val q117IvfKvIncremental: Q = Q(
    "q117_ivf_kv_incremental",
    (s, d) => {
      val idx = ensureIncrementalStageKv(s, d)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.ivfProbe(s, idx, queries, nProbe = 4)
    },
    Some(IvfStore.incOracleSql),
    doc = "IVF ANN maintained append-incrementally over a versioned graft-kv corpus")

  // ---- q118: DML-incremental maintenance, oracle-checked ----

  private[graft] def dmlStagedRoot(sfDir: String): String = {
    val abs = new File(sfDir).getAbsolutePath
    KvStore.cacheDir(
      s"ivfkvdml-${new File(sfDir).getName}-${Integer.toHexString(abs.hashCode)}")
  }

  /** Stage the DML scenario: commit the WHOLE driver corpus as a KV
    * table (v1, 8 range shards), build the index on it, then issue one
    * `replaceKeyRanges` DML over the middle-quintiles region
    * (positional vec_id thresholds th1 = P40, th2 = P60, replayed by
    * the oracle as row_number bounds): rows with `vec_id % 7 = 3` are
    * DELETED, rows with `vec_id % 7 = 5` get their embedding scaled by
    * 2 (exact in float AND in the oracle's double replay, since ×2
    * only bumps the exponent), everything else in the region survives
    * unchanged. ensure() then classifies the rewrite via the
    * watermark, derives the touched region from the two manifests, and
    * patches the index by re-assigning the region against the frozen
    * centroids — the full DML-incremental path under one oracle.
    * Same idempotence/crash contract as the q117 staging. */
  private[queries] def ensureDmlStageKv(s: SparkSession, sfDir: String): IvfIndex = {
    val root = dmlStagedRoot(sfDir)
    val corpus = s"$root/corpus"
    KvStore.withTableLock(root) {
      val srcFp = IvfStore.corpusFingerprint(sfDir)
      val marker = new File(s"$root/_staged.json")
      val staged = marker.exists() && {
        val m = mapper.readTree(marker)
        m.path("sourceFingerprint").asText() == srcFp &&
          m.path("phase").asText() == "dmled"
      }
      if (!staged) {
        IvfStore.rmrf(new File(corpus))
        IvfStore.rmrf(new File(indexRoot(corpus)))
        marker.delete()
        val raw = Tables.embeddings(s, sfDir)
          .select(col("vec_id"), col("embedding"))
        val n = raw.count()
        require(n >= 40, s"corpus too small to stage a DML region: n=$n")
        raw.repartitionByRange(8, col("vec_id"))
          .write.format("graft-kv")
          .option("catalog", corpusCatalog)
          .option("path", corpus).mode("append").save()
        build(s, corpus)
        // positional thresholds: vec_ids are unique, so `vec_id <= thr`
        // ≡ the first m rows in vec_id order — the oracle replays them
        // as row_number() OVER (ORDER BY vec_id) bounds
        def thAt(m: Long): Long = raw.select(col("vec_id"))
          .orderBy(col("vec_id")).limit(m.toInt)
          .agg(max(col("vec_id"))).head().getLong(0)
        val th1 = thAt(n * 4 / 10)
        val th2 = thAt(n * 6 / 10)
        val survivors = raw
          .filter(col("vec_id") > th1 && col("vec_id") <= th2 &&
            col("vec_id") % 7 =!= 3)
          .withColumn("embedding",
            when(col("vec_id") % 7 === 5,
              transform(col("embedding"), x => x * lit(2.0f)))
              .otherwise(col("embedding")))
        survivors.repartitionByRange(2, col("vec_id"))
          .write.format("graft-kv")
          .option("catalog", corpusCatalog)
          .option("path", corpus)
          .option("replaceKeyRanges",
            KeyRanges.serializeTyped(LongType, Seq((th1 + 1, th2))))
          .mode("overwrite").save()
        val node = mapper.createObjectNode()
        node.put("sourceFingerprint", srcFp)
        node.put("phase", "dmled")
        node.put("th1", th1)
        node.put("th2", th2)
        java.nio.file.Files.write(marker.toPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
      }
    }
    ensure(s, corpus)
  }

  /** q118's oracle: the frozen-centroid IVF replay with centroids fit
    * on the FULL pre-DML corpus (`dbl`) and assignment/probing/
    * rescoring over the post-DML state (`cur`): middle-quintile rows
    * with vec_id % 7 = 3 deleted, % 7 = 5 scaled ×2 (exact in both
    * engines' arithmetic), everything else untouched. */
  private[queries] val dmlOracleSql: String = Similarity.ivfOracleSqlFrom(
    """
      th AS (
        SELECT max(CASE WHEN rn <= cnt * 4 // 10 THEN vec_id END) AS th1,
               max(CASE WHEN rn <= cnt * 6 // 10 THEN vec_id END) AS th2
        FROM (SELECT vec_id,
                     row_number() OVER (ORDER BY vec_id) AS rn,
                     count(*) OVER () AS cnt
              FROM dbl) t),
      cur AS (
        SELECT vec_id,
               CASE WHEN vec_id > (SELECT th1 FROM th)
                     AND vec_id <= (SELECT th2 FROM th)
                     AND vec_id % 7 = 5
                    THEN list_transform(emb, x -> x * 2) ELSE emb END AS emb
        FROM dbl
        WHERE NOT (vec_id > (SELECT th1 FROM th)
                   AND vec_id <= (SELECT th2 FROM th)
                   AND vec_id % 7 = 3)),""", "dbl", "cur")

  /** q118: IVF ANN through an index BUILT on the full corpus and then
    * DML-INCREMENTALLY PATCHED after a replaceKeyRanges rewrite
    * (deletes + in-place updates) — the maintenance path a mutable
    * 100 TB corpus actually needs: the patch re-assigns only the
    * touched region against the frozen centroids instead of re-paying
    * the build. Deleted vectors must vanish from candidates, updated
    * vectors must rank under their NEW embeddings, untouched rows keep
    * bit-identical assignments — all pinned by the DuckDB replay. */
  val q118IvfKvDml: Q = Q(
    "q118_ivf_dml_incremental",
    (s, d) => {
      val idx = ensureDmlStageKv(s, d)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.ivfProbe(s, idx, queries, nProbe = 4)
    },
    Some(dmlOracleSql),
    doc = "IVF ANN patched DML-incrementally after deletes + updates on the KV corpus")

  // ---- q119: index-table self-maintenance, oracle-checked ----

  private[graft] def selfMaintStagedRoot(sfDir: String): String = {
    val abs = new File(sfDir).getAbsolutePath
    KvStore.cacheDir(
      s"ivfkvsm-${new File(sfDir).getName}-${Integer.toHexString(abs.hashCode)}")
  }

  /** Stage the self-maintenance scenario: build on the 90% prefix (same
    * split as q116/q117, so the SAME frozen-centroid oracle applies —
    * neither HOW MANY commits deliver the delta nor whether the index
    * table compacted itself between them can change a single
    * assignment), then land the remaining 10% as THREE separate append
    * commits, running a maintenance cycle after each under a low
    * `graft.ivfCompactShards` with grace-0 vacuum — every cycle
    * increments, self-compacts the fragmented assigned table, re-pins,
    * and reclaims the superseded generation. The staged invariant
    * (bounded live shard count) is asserted here; the RESULT invariant
    * (bit-identical probes) is what the DuckDB oracle hash-checks. */
  private[queries] def ensureSelfMaintStageKv(
      s: SparkSession, sfDir: String): IvfIndex = {
    val root = selfMaintStagedRoot(sfDir)
    val corpus = s"$root/corpus"
    KvStore.withTableLock(root) {
      val srcFp = IvfStore.corpusFingerprint(sfDir)
      val marker = new File(s"$root/_staged.json")
      val staged = marker.exists() && {
        val m = mapper.readTree(marker)
        m.path("sourceFingerprint").asText() == srcFp &&
          m.path("phase").asText() == "maintained"
      }
      if (!staged) {
        IvfStore.rmrf(new File(corpus))
        IvfStore.rmrf(new File(indexRoot(corpus)))
        marker.delete()
        val raw = Tables.embeddings(s, sfDir)
          .select(col("vec_id"), col("embedding"))
        val n = raw.count()
        val n0 = n * 9 / 10
        require(n0 > 0 && n0 + 3 <= n,
          s"corpus too small to stage a 3-cycle append split: n=$n")
        def thAt(m: Long): Long = raw.select(col("vec_id"))
          .orderBy(col("vec_id")).limit(m.toInt)
          .agg(max(col("vec_id"))).head().getLong(0)
        val cuts = Seq(n0, n0 + (n - n0) / 3, n0 + 2 * (n - n0) / 3).map(thAt)
        def commit(df: DataFrame): Unit =
          df.repartitionByRange(2, col("vec_id"))
            .write.format("graft-kv")
            .option("catalog", corpusCatalog)
            .option("path", corpus)
            .mode("append").save()
        commit(raw.filter(col("vec_id") <= cuts(0))) // v1: the build basis
        build(s, corpus)
        s.conf.set("graft.ivfCompactShards", "4")
        s.conf.set("graft.ivfVacuumGraceMs", "0")
        try {
          commit(raw.filter(col("vec_id") > cuts(0) && col("vec_id") <= cuts(1)))
          ensure(s, corpus) // cycle 1: increment + self-compact + vacuum
          commit(raw.filter(col("vec_id") > cuts(1) && col("vec_id") <= cuts(2)))
          ensure(s, corpus) // cycle 2
          commit(raw.filter(col("vec_id") > cuts(2)))
          ensure(s, corpus) // cycle 3
        } finally {
          s.conf.unset("graft.ivfCompactShards")
          s.conf.unset("graft.ivfVacuumGraceMs")
        }
        val liveShards =
          KvStore.readMeta(s"${indexRoot(corpus)}/assigned").shards.length
        require(liveShards <= 4,
          s"self-maintenance left $liveShards live shards after 3 cycles " +
            "(expected the compacted bound)")
        val node = mapper.createObjectNode()
        node.put("sourceFingerprint", srcFp)
        node.put("phase", "maintained")
        java.nio.file.Files.write(marker.toPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
      }
    }
    ensure(s, corpus)
  }

  /** q119: IVF ANN through an index extended by THREE maintenance
    * cycles with index-table SELF-COMPACTION (+ grace-0 vacuum)
    * between them — the long-lived-index shape: repeated increments
    * fragment the assigned table, the maintenance step merges it back
    * and re-pins, and none of that may change a single assignment.
    * Same DuckDB oracle as q116/q117 (centroid basis = the 90%
    * prefix): compaction is row-preserving, so the replay is
    * identical whether the delta arrived in one commit or three with
    * compactions between. */
  val q119IvfSelfMaintain: Q = Q(
    "q119_ivf_self_maintain",
    (s, d) => {
      val idx = ensureSelfMaintStageKv(s, d)
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.ivfProbe(s, idx, queries, nProbe = 4)
    },
    Some(IvfStore.incOracleSql),
    doc = "IVF ANN through 3 maintenance cycles with index-table self-compaction between them")

  def defs: Seq[Q] = Seq(q117IvfKvIncremental, q118IvfKvDml, q119IvfSelfMaintain)
}
