package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** Batched-probe equivalence (r19): `ivfProbeAll` / `Bm25Store.probeAll`
  * are the distributed-query-relation twins of the exemplar probes —
  * same math, same ranking, no query-side broadcast, no driver loop.
  * The oracle gate pins q137/q138 against full SQL replays; these
  * specs pin the cheaper invariant that the batched plans are
  * BIT-IDENTICAL to the single-probe plans on the same inputs, so any
  * later drift between the two code paths fails fast. */
class ProbeAllSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private val Terms = Seq("table", "vector", "customer", "stream")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("ivfProbeAll ≡ ivfProbe on the same query set — broadcast AND salted join regimes") {
    val idx = IvfStore.ensure(spark, d)
    val qs = Tables.embeddings(spark, d).filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exemplar = rows(Similarity.ivfProbe(spark, idx, qs, nProbe = 4))
    assert(rows(Similarity.ivfProbeAll(spark, idx, qs, nProbe = 4)) == exemplar,
      "the distributed batched probe must rank exactly like the exemplar probe")
    // force the large-|Q| salted regime (broadcast bound 0): the hot-cell
    // mitigation must be invisible in the results — same pairs, same
    // exact cosines, same ranking
    val salted = StreamMaint.withConfs(spark,
      "graft.ivfProbeBroadcastMaxRows" -> "0")(
      rows(Similarity.ivfProbeAll(spark, idx, qs, nProbe = 4)))
    assert(salted == exemplar,
      "the salted skew-mitigated join must rank exactly like the exemplar probe")
  }

  /** Force a specific probeAll regime regardless of batch/vocab size —
    * without this, small batches take probeAllExhaustive by design and
    * the equivalence assertions would compare the exhaustive plan to
    * itself. `dense` disables only the small-batch switch (a small
    * vocabulary then rides the dense kernel); `maxScore` disables the
    * dense kernel too, forcing the champion-sidecar path. */
  private def dense[T](body: => T): T =
    StreamMaint.withConfs(spark,
      "graft.bm25ProbeExhaustiveMaxTokens" -> "0",
      "graft.bm25DenseVocabMax" -> "1000000")(body)

  private def maxScore[T](body: => T): T =
    StreamMaint.withConfs(spark,
      "graft.bm25ProbeExhaustiveMaxTokens" -> "0",
      "graft.bm25DenseVocabMax" -> "0")(body)

  private def pruned[T](body: => T): T = maxScore(body)

  test("bm25 probeAll ≡ probe for the same term set, with set semantics") {
    import spark.implicits._
    val (pDir, lDir) =
      Bm25Store.buildIfAbsent(spark, d, "full", Tables.documents(spark, d))
    val single = rows(Bm25Store.probe(spark, pDir, lDir, Terms)
      .select("rk", "doc_id", "bm25_r"))
    val batched = Seq((7L, Terms)).toDF("q_id", "terms")
    // both plan regimes must reproduce the single probe: the default
    // (small batch -> exhaustive) and the forced MaxScore path
    assert(rows(Bm25Store.probeAll(spark, pDir, lDir, batched)
        .select("rk", "doc_id", "bm25_r")) == single,
      "a one-query batch must reproduce the single probe exactly")
    assert(pruned(rows(Bm25Store.probeAll(spark, pDir, lDir, batched)
        .select("rk", "doc_id", "bm25_r"))) == single,
      "the MaxScore path must reproduce the single probe exactly")
    // duplicate terms inside a query collapse — probe's isin semantics
    val duped = Seq((7L, Terms ++ Terms.take(2))).toDF("q_id", "terms")
    assert(pruned(rows(Bm25Store.probeAll(spark, pDir, lDir, duped)
        .select("rk", "doc_id", "bm25_r"))) == single,
      "duplicate query terms must not double-count term scores")
  }

  test("bm25 probeAll MaxScore pruning is rank-safe: ≡ exhaustive on a real batch") {
    import org.apache.spark.sql.functions.slice
    val (pDir, lDir) =
      Bm25Store.buildIfAbsent(spark, d, "full", Tables.documents(spark, d))
    // first-token query sets are stop-word-heavy — exactly the shape
    // the pruning exists for; include some with < topK matches so the
    // no-floor (θ = -inf) path is exercised too
    val queries = Tables.documents(spark, d).filter(col("doc_id") < 100)
      .select(col("doc_id").as("q_id"),
        slice(graft.functions.Text.tokens(col("text")), 1, 3).as("terms"))
    for (k <- Seq(1, 5, 10)) {
      val exhaustive =
        rows(Bm25Store.probeAllExhaustive(spark, pDir, lDir, queries, topK = k))
      assert(maxScore(rows(Bm25Store.probeAll(spark, pDir, lDir, queries, topK = k))) ==
        exhaustive,
        s"MaxScore pruning must be bit-identical to the exhaustive plan at topK=$k")
      assert(dense(rows(Bm25Store.probeAll(spark, pDir, lDir, queries, topK = k))) ==
        exhaustive,
        s"the dense kernel must be bit-identical to the exhaustive plan at topK=$k")
    }
  }

  test("bm25 champion sidecar tracks index content: append invalidates, rebuild stays rank-safe") {
    import org.apache.spark.sql.functions.slice
    val docs = Tables.documents(spark, d)
    val cut = (docs.count() * 9) / 10
    // fresh (non-cacheDir) store: this test MUTATES the index, and a
    // buildIfAbsent-cached store would arrive already grown on the next
    // JVM, turning the append into a frontier no-op
    val (pDir, lDir) = {
      val p = java.nio.file.Files.createTempDirectory("champ-p").toString + "/t"
      val l = java.nio.file.Files.createTempDirectory("champ-l").toString + "/t"
      val (pr, dlr) = Bm25Store.indexRows(docs.filter(col("doc_id") < cut))
      Bm25Store.writePostings(spark, pr, p, "overwrite", 2)
      Bm25Store.writeDl(spark, dlr, l, "overwrite")
      (p, l)
    }
    val queries = docs.filter(col("doc_id") < 50)
      .select(col("doc_id").as("q_id"),
        slice(graft.functions.Text.tokens(col("text")), 1, 3).as("terms"))
    val before = pruned(rows(Bm25Store.probeAll(spark, pDir, lDir, queries)))
    val sidecarBefore = Bm25Store.ensureChampions(spark, pDir, lDir)
    // append the tail through maintenance: content fingerprint changes
    Bm25Store.maintainBatch(spark, docs, pDir, lDir): Unit
    val sidecarAfter = Bm25Store.ensureChampions(spark, pDir, lDir)
    assert(sidecarAfter != sidecarBefore,
      "an append must invalidate the champion sidecar (content fingerprint)")
    val after = pruned(rows(Bm25Store.probeAll(spark, pDir, lDir, queries)))
    assert(after ==
      rows(Bm25Store.probeAllExhaustive(spark, pDir, lDir, queries)),
      "the rebuilt sidecar must stay rank-safe against the grown index")
    assert(after != before,
      "fixture sanity: the appended tail must actually change some ranking")
  }

  test("bm25 probeAll regimes agree on seeded-random batches (fuzz)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.explode
    val (pDir, lDir) =
      Bm25Store.buildIfAbsent(spark, d, "full", Tables.documents(spark, d))
    // real corpus vocabulary, frequent first — so random draws mix
    // stop-word-class and selective terms the way real queries do
    val vocab = Tables.documents(spark, d)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t"))
      .limit(200).select("t").as[String].collect()
    val rnd = new scala.util.Random(20260816L)
    for (round <- 1 to 3) {
      val topK = 1 + rnd.nextInt(10)
      val queries = (0 until 40).map { q =>
        val n = 1 + rnd.nextInt(4)
        (q.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))))
      }.toDF("q_id", "terms")
      val exhaustive =
        rows(Bm25Store.probeAllExhaustive(spark, pDir, lDir, queries, topK))
      assert(maxScore(rows(
        Bm25Store.probeAll(spark, pDir, lDir, queries, topK))) == exhaustive,
        s"fuzz round $round (topK=$topK): MaxScore must match exhaustive")
      assert(dense(rows(
        Bm25Store.probeAll(spark, pDir, lDir, queries, topK))) == exhaustive,
        s"fuzz round $round (topK=$topK): dense kernel must match exhaustive")
    }
  }

  test("salted skew audit conserves the unsalted candidate load per cell") {
    import org.apache.spark.sql.functions.sum
    val idx = IvfStore.ensure(spark, d)
    val qs = Tables.embeddings(spark, d).filter(col("vec_id") < 200)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val raw = Similarity.ivfCellLoad(spark, idx, qs, nProbe = 4)
      .select(col("cell").cast("long"), col("candidates"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Σ_salt candidates(cell, salt) = candidates(cell): the salted keying
    // repartitions the load, it must never create or drop candidate pairs
    val salted = Similarity.ivfCellLoadSalted(spark, idx, qs, nProbe = 4, saltF = 16)
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(sum(col("candidates")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == raw,
      "per-cell candidate load must be conserved across the salted keying")
    assert(raw.nonEmpty, "fixture sanity: the audit must see probed cells")
  }

  test("lsh probeBatch ≡ the persisted pair relation filtered to the batch") {
    val docs = Tables.documents(spark, d)
    val cut = (docs.count() * 9) / 10
    val (bDir, lDir) =
      LshStore.buildIfAbsent(spark, d, "full", Tables.documents(spark, d))
    val batched = rows(
      LshStore.probeBatch(spark, bDir, lDir, docs.filter(col("doc_id") >= cut)))
    val filtered = rows(
      LshStore.pairs(spark, bDir, lDir).filter(col("id_b") >= cut)
        .orderBy(col("id_a"), col("id_b")))
    assert(batched == filtered,
      "in-flight batch sketch must reproduce the stored rows' pair relation")
    assert(batched.nonEmpty,
      "fixture sanity: the tail must have at least one near-dup partner")
  }

  test("batched-probe plans contain no cartesian product") {
    import spark.implicits._
    val idx = IvfStore.ensure(spark, d)
    val qs = Tables.embeddings(spark, d).filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val ivfPlan = Similarity.ivfProbeAll(spark, idx, qs, nProbe = 4)
      .queryExecution.executedPlan.toString
    assert(!ivfPlan.contains("CartesianProduct"),
      "ivfProbeAll must never degrade to a cartesian product")
    assert(ivfPlan.contains("BroadcastHashJoin"),
      "small probe relations must broadcast — the corpus side must not shuffle")
    // the CANDIDATES join specifically (ADVICE r20: coarse/centRouted are
    // broadcast anyway, so the bare BroadcastHashJoin assertion above
    // would pass even if the candidates join shuffled): in the broadcast
    // regime no exchange may hash-partition on `cell` at all
    assert(!"""hashpartitioning\(cell#""".r.findFirstIn(ivfPlan).isDefined,
      s"broadcast regime must not shuffle the assigned side on cell:\n$ivfPlan")
    val saltedPlan = StreamMaint.withConfs(spark,
      "graft.ivfProbeBroadcastMaxRows" -> "0")(
      Similarity.ivfProbeAll(spark, idx, qs, nProbe = 4)
        .queryExecution.executedPlan.toString)
    assert(!saltedPlan.contains("CartesianProduct"),
      "the salted regime must never degrade to a cartesian product")
    // the exchange must key on BOTH cell and salt (a plan that merely
    // carries a `salt` column would pass the r20 contains("salt") check)
    assert("""hashpartitioning\(cell#\d+L?, salt#""".r.findFirstIn(saltedPlan).isDefined,
      s"the large-|Q| regime must key the candidates exchange on (cell, salt):\n$saltedPlan")
    val (pDir, lDir) =
      Bm25Store.buildIfAbsent(spark, d, "full", Tables.documents(spark, d))
    val queries = Seq((1L, Seq("table")), (2L, Seq("vector", "stream")))
      .toDF("q_id", "terms")
    for (forcePruned <- Seq(false, true)) {
      val bmPlan =
        if (forcePruned)
          pruned(Bm25Store.probeAll(spark, pDir, lDir, queries)
            .queryExecution.executedPlan.toString)
        else Bm25Store.probeAll(spark, pDir, lDir, queries)
          .queryExecution.executedPlan.toString
      assert(!bmPlan.contains("CartesianProduct"),
        s"probeAll (pruned=$forcePruned) must never degrade to a cartesian product")
    }
  }
}
