package graft

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},...}`.
  *
  * Parent/child architecture: running all ~60 codegen-heavy queries × 2
  * repeats in ONE JVM accumulates generated-class state (JIT code cache,
  * metaspace) that inflated late-suite timings up to 25× vs a fresh JVM
  * in round 3 (q74 22.1 s reported vs 2.3 s fresh). The parent therefore
  * forks a fresh child JVM per batch of queries — inheriting classpath,
  * module opens and memory flags, plus explicit code-cache headroom —
  * and merges the children's JSON. Per-query timings happen inside the
  * child; JVM startup and warmup stay untimed. If forking fails (locked
  * -down environment), the parent falls back to the single-JVM run.
  */
object Bench {

  /** Correctness-gate-only md5 oracle twins: q43/q44 bench the SAME
    * banded sketch pipelines with the production xxhash64 hash family;
    * the md5 twins exist solely to make those pipelines
    * DuckDB-hash-checkable, and their ~10× hash cost measures the
    * oracle tax, not the engine. They stay in `SparkEntry.queries`
    * (so the correctness gate still verifies them) but out of the
    * timed suite. */
  val oracleOnly: Set[String] = Set("q46_minhash_md5", "q47_simhash_md5")

  /** Queries whose steady timings are warm reads of session-persisted
    * relations (dedup shingles / verified pairs, packing token counts).
    * The bench protocol amortizes those builds across the family — the
    * way a real pipeline does — but the headline number must not pass
    * for a cold query: each of these ALSO gets a dedicated cache-cold
    * run (caches released first, one-time build included) committed
    * next to the steady min as `cold_first_sec`, and the artifact names
    * the warm readers in `cached_relations` (round 13; r12's numbers
    * required cross-referencing the stress artifacts to decompose). */
  val cachedRelations: Set[String] = Set(
    "q42_ngram_jaccard", "q43_minhash_lsh", "q45_dedup_clusters",
    "q105_sequence_packing", "q106_pack_manifest")
  /** Cold-measured set: the cache riders plus q111 as a control — it
    * builds its own digest windows (no shared relation), so its cold ≈
    * steady row documents which dedup numbers amortize and which don't. */
  val coldMeasured: Set[String] = cachedRelations + "q111_substring_dedup"

  private def sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private def cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
  private def repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt.max(1)
  /** Child JVMs run with a PINNED heap (-Xms = -Xmx = this), never the
    * parent's inherited flags: round 16's driver-vs-committed dispute
    * (7 queries 6–24× apart at the same HEAD) could not be adjudicated
    * from artifacts because the children's heap depended on however the
    * PARENT happened to be launched. Same value on every host → the two
    * runs are comparable by construction, and the artifact records it. */
  private def childHeap = sys.env.getOrElse("SPARK_GRAFT_BENCH_CHILD_HEAP", "8g")
  /** Sub-second queries repeat up to this many times (min reported):
    * at 2 repeats a ±0.1 s load blip reads as a ±40% "regression" on a
    * 0.25 s query — round 7's r6-diff had a cluster of exactly those.
    * Expensive queries keep the base repeat count (their noise floor is
    * proportionally irrelevant and extra runs cost real wall-clock). */
  private def fastRepeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS_FAST", "7").toInt
    .max(repeats)
  private val FastThresholdSec = 1.0
  /** Sub-second storm sensitivity (r21). The r20 round closed with a
    * driver-vs-committed 3× whipsaw on q21 (1.45 vs 0.48 s at the same
    * HEAD) with `storm_discarded` EMPTY: a sustained window of MODERATE
    * interference (sys% below the 0.35 discard threshold) can cover a
    * sub-second query's entire repeat loop, poisoning every pass at
    * once — an expensive query amortizes such a window, a 0.5 s one
    * does not. Sub-second passes therefore discard at
    * stormSysPct × this factor (0.35 → 0.21 by default), and the fast
    * band runs 7 repeats (was 5) so the loop spans more wall-clock than
    * a single interference window. Both knobs are env-overridable; the
    * artifact's storm_discarded field discloses every discard as
    * before. Timed action unchanged. */
  private def fastStormFactor =
    sys.env.getOrElse("SPARK_GRAFT_STORM_FAST_FACTOR", "0.6").toDouble
  /** Mid tier (round 9): the r8-vs-r7 diff flagged +25–50% swings on
    * 1–2.5 s queries that ran only the base 2 repeats — the same
    * noise-floor problem one tier up. Queries under 2.5 s now get
    * min-of-≥4 so a single load blip can't masquerade as a regression. */
  private def midRepeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS_MID", "4").toInt
    .max(repeats)
  private val MidThresholdSec = 2.5

  /** Kernel-storm guard (r19). THE HOST HAS KERNEL STORMS: multi-ten-
    * second windows of sys% 83–96 across all 32 cores (documented in
    * ARCHITECTURE "Bench-drift contract") that make any shuffle-heavy
    * query 5–15× slow at random — min-of-repeats absorbs one bad pass,
    * but a storm spanning the whole repeat loop still poisons the min.
    * Each timed pass therefore samples /proc/stat around itself; a pass
    * whose window ran ≥ [[stormSysPct]] system-mode is DISCARDED and
    * retried (bounded by [[stormRetries]] extra passes per query), and
    * the artifact records every discard under "storm_discarded" so two
    * runs of the same HEAD stay decidable from their JSON alone. A
    * query that exhausts its retries keeps the tainted sample —
    * reported timings are never silently dropped, only re-measured. */
  private def stormSysPct = sys.env.getOrElse("SPARK_GRAFT_STORM_SYS_PCT", "0.35").toDouble
  private def stormRetries = sys.env.getOrElse("SPARK_GRAFT_STORM_RETRIES", "2").toInt
  /** Spread widening (r20): a storm window that spans the WHOLE repeat
    * loop inflates every pass without any single pass tripping the
    * sys% guard hard enough to discard — the r19 driver rows q121/q122
    * whipsawed exactly this way. When the repeat loop's max/min spread
    * exceeds [[SpreadFactor]] the pass count widens (bounded by this
    * cap) so the reported min gets more chances to land outside the
    * storm window. Cheap queries already widen via fast/mid repeats;
    * this catches the expensive ones. */
  private def spreadRepeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_SPREAD_REPEATS", "8").toInt
  private val SpreadFactor = 1.4

  def main(args: Array[String]): Unit = {
    // every number below rides f"...%.2f" into JSON — under a
    // comma-decimal default locale that emits invalid JSON, so pin the
    // whole process (parent, forked children inherit via their own main)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    sys.env.get("SPARK_GRAFT_BENCH_CHILD") match {
      case Some(csv) => // child: time the named queries, print one JSON line
        val out = runQueries(csv.split(",").filter(_.nonEmpty).toSeq)
        println(resultJson(out, skipped = Nil))
      case None => parent()
    }
  }

  /** One batch's measurements: per-query steady mins, failures, the
    * cache-cold datapoints with their pass sys% (a cold pass is a
    * ONE-shot number — if it overlapped a storm the artifact must say
    * so), and per-query storm-discard counts. */
  private case class RunOut(results: Seq[(String, Double)],
                            failed: Seq[String],
                            colds: Seq[(String, Double)],
                            coldSys: Seq[(String, Double)],
                            storms: Seq[(String, Int)])

  private def parent(): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(oracleOnly)
    // one child JVM PER QUERY by default (round 17): batching shared one
    // heap across a query family, so a GC-heavy neighbor (the r16
    // PQ/RRF/MMR additions) could inflate an untouched query's timing by
    // an amount invisible in any artifact. Per-query isolation makes
    // every number attributable to exactly one plan. JVM startup stays
    // untimed and the KV corpus builds are disk-cached across children,
    // so the cost is wall-clock only.
    val batchSize = sys.env.getOrElse("SPARK_GRAFT_BENCH_BATCH", "1").toInt.max(1)
    val batches = names.grouped(batchSize).toSeq
    // a failed child falls back PER BATCH (bias confined to that batch)
    // and the output says so — timings from a fallback batch carry the
    // single-JVM caveat and must not silently pass for fresh-JVM numbers
    val fallbackBatches = scala.collection.mutable.ListBuffer[String]()
    val acc = scala.collection.mutable.ListBuffer[RunOut]()
    batches.zipWithIndex.foreach { case (batch, i) =>
      System.err.println(s"[bench] batch ${i + 1}/${batches.length}: ${batch.head}..${batch.last}")
      acc += (try runChild(batch)
      catch {
        case e: Exception =>
          System.err.println(s"[bench] child failed (${e.getMessage}); in-process fallback for this batch")
          fallbackBatches ++= batch
          runQueries(batch)
      })
      // cumulative partial line after EVERY child: if the whole run is
      // killed by an external timeout, the captured stdout tail still
      // ends with a complete, parseable line covering everything
      // measured so far ("partial":true) instead of nothing at all
      if (i + 1 < batches.length)
        println(compactJson(merge(acc.toSeq), partial = true))
    }
    val all = merge(acc.toSeq)
    val json = resultJson(all, skipped = oracleOnly.toSeq.sorted,
      fallback = fallbackBatches.toSeq)
    // the driver's bench artifact keeps only a BOUNDED TAIL of stdout
    // (~2000 chars): the full-name full-precision line (~3200 chars for
    // ~100 queries) gets truncated mid-map and the round artifact
    // records `parsed: null`. Print a COMPACT line instead — q-number
    // keys ("q45" for "q45_dedup_clusters"; the number prefix is unique
    // by construction) and 2-decimal seconds (~1300 chars) — so the
    // immutable BENCH_rNN.json carries a complete parseable map. The
    // full-fidelity line persists in BENCH_LOCAL.json (committed per
    // round as BENCH_rNN_full.json via tools/snapshot_bench.py).
    println(compactJson(all))
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] BENCH_LOCAL.json: ${e.getMessage}") }
  }

  /** Host/JVM snapshot embedded in every bench artifact so a
    * driver-vs-committed disagreement is decidable from the two JSON
    * lines alone: available memory and load at measurement time, the
    * pinned child heap, and the isolation granularity. */
  private def envJson(): String = {
    def firstLine(p: String): String =
      try scala.io.Source.fromFile(p).getLines().next() catch { case _: Exception => "" }
    val availGb =
      try scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemAvailable:") =>
          l.split("\\s+")(1).toLong / 1048576.0 }.getOrElse(-1.0)
      catch { case _: Exception => -1.0 }
    // filter(_.nonEmpty): "".split(" ") is Array(""), so a bare headOption
    // would embed an EMPTY unquoted value — malformed JSON (matching
    // Stress.hostJson's fallback)
    val load1 = firstLine("/proc/loadavg").split(" ").headOption
      .filter(_.nonEmpty).getOrElse("-1")
    val jv = System.getProperty("java.version", "?")
    f"""{"child_heap":"$childHeap","batch":${sys.env.getOrElse("SPARK_GRAFT_BENCH_BATCH", "1")},"repeats":$repeats,"cpus":"$cpus","avail_gb":$availGb%.1f,"load1":$load1,"java":"$jv"}"""
  }

  private def merge(batches: Seq[RunOut]): RunOut =
    RunOut(batches.flatMap(_.results), batches.flatMap(_.failed),
      batches.flatMap(_.colds), batches.flatMap(_.coldSys),
      batches.flatMap(_.storms))

  private def compactJson(out: RunOut, partial: Boolean = false): String = {
    import out._
    def short(n: String): String = n.split("_").head
    // q-number prefixes are unique today; if a future name collides,
    // fall back to full names for the colliding entries rather than
    // silently merging two timings under one key
    val counts = results.groupBy(r => short(r._1)).map { case (k, v) => k -> v.size }
    def key(n: String): String = if (counts(short(n)) == 1) short(n) else n
    val qs = results.sortBy(_._1)
      .map { case (k, v) => "\"" + key(k) + "\":" + (if (v.isNaN) "null" else f"$v%.2f") }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if !v.isNaN && v >= 0 => v }.sum
    val failedArr = failed.map(n => "\"" + key(n) + "\"").mkString("[", ",", "]")
    val coldMap = colds.sortBy(_._1)
      .map { case (k, v) => "\"" + key(k) + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    val coldSysMap = coldSys.sortBy(_._1)
      .map { case (k, v) => "\"" + key(k) + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    // partial progress lines carry a DISTINCT metric: a consumer that
    // greps the FIRST "metric":"total" match must never read a partial
    // cumulative sum as the run's result (the "partial":true field alone
    // doesn't protect such a consumer)
    val metric = if (partial) "total_partial" else "total"
    val stormMap = storms.sortBy(_._1)
      .map { case (k, v) => "\"" + key(k) + "\":" + v }.mkString("{", ",", "}")
    f"""{"metric":"$metric","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir","repeats":$repeats,"partial":$partial,"failed":$failedArr,"cold_first_sec":$coldMap,"cold_sys_pct":$coldSysMap,"storm_discarded":$stormMap,"env":${envJson()},"full_map":"BENCH_LOCAL.json"}"""
  }

  /** Fork one fresh JVM for `batch`, parse its JSON line. */
  private def runChild(batch: Seq[String]): RunOut = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // inherit module opens / -D flags (a child without the --add-opens
    // list cannot even build a SparkSession on JDK 17+) but NOT the
    // parent's memory flags — the child heap is pinned so two runs of
    // the same HEAD are comparable no matter how the parent was launched
    val inherited = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.toSeq
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-D") || a.contains("=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ inherited ++ Seq(
      s"-Xms$childHeap", s"-Xmx$childHeap",
      "-XX:ReservedCodeCacheSize=512m", // codegen headroom: the round-3 bias
      "-cp", System.getProperty("java.class.path"),
      "graft.Bench")
    val pb = new ProcessBuilder(cmd.asJava)
    pb.environment().put("SPARK_GRAFT_BENCH_CHILD", batch.mkString(","))
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
    val exit = proc.waitFor()
    val jsonLine = out.reverse.find(_.startsWith("""{"metric""""))
      .getOrElse(sys.error(s"child exited $exit without a result line"))
    val root = new ObjectMapper().readTree(jsonLine)
    val qs = root.get("queries")
    val results = qs.fieldNames.asScala.toSeq.map { n =>
      val node = qs.get(n)
      n -> (if (node.isNull) Double.NaN else node.asDouble)
    }
    val failed = root.get("failed").elements.asScala.map(_.asText).toSeq
    val colds = Option(root.get("cold_first_sec")).toSeq.flatMap { node =>
      node.fieldNames.asScala.toSeq.map(n => n -> node.get(n).asDouble)
    }
    val coldSys = Option(root.get("cold_sys_pct")).toSeq.flatMap { node =>
      node.fieldNames.asScala.toSeq.map(n => n -> node.get(n).asDouble)
    }
    val storms = Option(root.get("storm_discarded")).toSeq.flatMap { node =>
      node.fieldNames.asScala.toSeq.map(n => n -> node.get(n).asInt)
    }
    RunOut(results, failed, colds, coldSys, storms)
  }

  /** Time `names` in THIS JVM (min over `repeats`); the original
    * single-JVM loop, now per-batch. */
  private def runQueries(names: Seq[String]): RunOut = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: every ONE-TIME KV table build stays untimed. The builds
    // are disk-cached across JVMs, so with per-query children only the
    // first child on a host pays them; when cached this is a metadata
    // stat (a full q70 execution per child was ~2s × 116 children of
    // pure overhead). Codegen/JIT warmth needs no separate warmup: the
    // min over 3–5 repeats discards the first-iteration compile cost.
    try queries.KvQueries.ensureLineitemKv(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }
    names.filter(Set("q81_kv_compacted", "q82_kv_streamed", "q84_kv_types")).foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $n: ${e.getMessage}") }
    }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val colds = scala.collection.mutable.ListBuffer[(String, Double)]()
    val coldSys = scala.collection.mutable.ListBuffer[(String, Double)]()
    val storms = scala.collection.mutable.ListBuffer[(String, Int)]()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      // cache-cold datapoint first: release the shared relations, pay
      // the one-time build inside the measurement, THEN let the normal
      // repeat loop measure the warm steady floor. The cold number is a
      // one-shot, so it gets the same storm treatment as steady passes
      // (r20): a storm-tainted cold run is retried (caches re-released
      // — the build re-runs, so the retry is still genuinely cold) and
      // the pass's sys% is emitted under cold_sys_pct either way, so a
      // tainted survivor is disclosed rather than silently kept.
      if (coldMeasured(name)) {
        var coldTries = 0
        var done = false
        while (!done && coldTries <= stormRetries) {
          queries.Dedup.releaseShingles()
          queries.Curation.releaseTokenCounts()
          val j0 = util.Host.cpuJiffies()
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).queryExecution.toRdd.count()
            val dt = (System.nanoTime() - t0) / 1e9
            val sysPct = util.Host.sysPct(j0, util.Host.cpuJiffies())
            if (sysPct >= stormSysPct && coldTries < stormRetries) {
              coldTries += 1
              System.err.println(f"[bench] $name: cold pass overlapped a kernel " +
                f"storm (sys=${sysPct * 100}%.0f%%), re-running cold ($coldTries/$stormRetries)")
            } else {
              if (sysPct >= stormSysPct) System.err.println(
                f"[bench] $name: cold storm retries exhausted, keeping a " +
                  f"tainted cold pass (sys=${sysPct * 100}%.0f%%)")
              colds += name -> dt
              coldSys += name -> sysPct
              done = true
            }
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name cold run failed: ${e.getMessage}")
            done = true
          }
        }
      }
      // one UNTIMED execution first: in the batched protocol a query
      // inherited JIT/codegen warmth from its batchmates; a per-query
      // child starts cold, and without this the sub-second floor
      // carries a fixed ~0.1–0.3 s compile tax (measured: the whole
      // sub-second family read ~2× its batched floor). For the
      // cache-riding queries this runs AFTER the timed cold run above,
      // so cold_first_sec stays genuinely cold.
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case _: Throwable => () } // the timed loop reports failures
      val times = scala.collection.mutable.ListBuffer[Double]()
      var attempts = 0
      var discarded = 0
      // base repeats for everyone; sub-second queries keep going (up to
      // fastRepeats) so the reported min is a real floor, not load noise;
      // any query whose passes SPREAD past SpreadFactor keeps going too
      // (up to spreadRepeats) — a storm window spanning the base repeats
      // otherwise poisons the min without tripping any per-pass guard
      while (attempts < repeats ||
             (attempts < fastRepeats && times.nonEmpty && times.min < FastThresholdSec) ||
             (attempts < midRepeats && times.nonEmpty && times.min < MidThresholdSec) ||
             (attempts < spreadRepeats && times.nonEmpty &&
               times.max / times.min > SpreadFactor)) {
        val j0 = util.Host.cpuJiffies()
        val t0 = System.nanoTime()
        // toRdd.count() materializes the FULL physical plan (projections,
        // sorts, limits) without collecting to the driver; plain count()
        // would let Catalyst prune most of the query away.
        var dt = -1.0
        try { fn(spark, sfDir).queryExecution.toRdd.count()
              dt = (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        if (dt < 0) attempts += 1 // failures count against the loop bound
        else {
          val sysPct = util.Host.sysPct(j0, util.Host.cpuJiffies())
          // sub-second passes trip the guard at a LOWER sys% (see
          // fastStormFactor): moderate sustained interference that an
          // expensive query rides out poisons every pass of a 0.5 s one.
          // Band membership uses the BEST time seen so far, not this
          // pass's own dt — a storm-inflated pass of a 0.4 s query reads
          // > 1 s and would otherwise escape its own band's guard.
          val bestSoFar = if (times.isEmpty) dt else math.min(times.min, dt)
          val threshold =
            if (bestSoFar < FastThresholdSec) stormSysPct * fastStormFactor
            else stormSysPct
          if (sysPct >= threshold && discarded < stormRetries) {
            discarded += 1
            System.err.println(f"[bench] $name: pass overlapped a kernel storm " +
              f"(sys=${sysPct * 100}%.0f%%), discarding and re-measuring " +
              f"($discarded/$stormRetries)")
          } else {
            if (sysPct >= threshold) System.err.println(
              f"[bench] $name: storm retries exhausted, keeping a tainted pass " +
                f"(sys=${sysPct * 100}%.0f%%)")
            times += dt
            attempts += 1
          }
        }
      }
      if (discarded > 0) storms += name -> discarded
      if (times.isEmpty) failed += name
      // NaN → emitted as JSON null: a crashing query must never look like
      // a fast one, and null can't be misread as a timing by per-query
      // tooling the way a -1.0 sentinel could
      name -> (if (times.isEmpty) Double.NaN else times.min)
    }
    queries.Dedup.releaseShingles() // free the dedup pass's persisted blocks
    queries.Curation.releaseTokenCounts()
    spark.stop()
    RunOut(results, failed.toSeq, colds.toSeq, coldSys.toSeq, storms.toSeq)
  }

  private def resultJson(out: RunOut, skipped: Seq[String],
                         fallback: Seq[String] = Nil): String = {
    import out._
    val qs = results.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + (if (v.isNaN) "null" else v.toString) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if !v.isNaN && v >= 0 => v }.sum
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val coldMap = colds.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v.toString }.mkString("{", ",", "}")
    val coldSysMap = coldSys.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v.toString }.mkString("{", ",", "}")
    val stormMap = storms.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","repeats":$repeats,"failed":${arr(failed)},"cold_first_sec":$coldMap,"cold_sys_pct":$coldSysMap,"storm_discarded":$stormMap,"storm_sys_pct":$stormSysPct,"cached_relations":${arr(cachedRelations.toSeq.sorted)},"skipped_oracle_twins":${arr(skipped)},"single_jvm_fallback":${arr(fallback)},"env":${envJson()}}"""
  }
}
