package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.Text
import org.apache.spark.sql.functions._

/** Corpus-curation operators: repetition quality signals, benchmark
  * decontamination, vocabulary OOV. The DuckDB hash gate checks value
  * parity; these specs check the SEMANTICS against brute-force
  * reformulations and the plan shapes the 100 TB story depends on. */
class CurationSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  test("maxRunLength = occurrence count of the most frequent token") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "a", "a", "c")), // a×3
      (2L, Seq("x")),                     // single token
      (3L, Seq.empty[String]),            // empty doc
      (4L, Seq("t", "t", "t", "t"))       // all one token
    ).toDF("id", "toks")
    val got = df.select($"id", Curation.maxRunLength($"toks").as("mr"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 4L))
  }

  test("maxRunLength ≡ mode count on randomized token arrays (property)") {
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    import spark.implicits._
    // small alphabet forces runs; lengths 0-60 cover empty + boundaries
    val toksGen = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "e f")))
    // evaluate the COLUMN expression against a plain Scala mode count —
    // batched: collect the generated arrays, run one Spark job for all
    val cases = Gen.listOfN(120, toksGen).sample.get
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("i", "toks")
    val got = df.select($"i", Curation.maxRunLength($"toks").as("mr"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Prop.forAll(Gen.choose(0, cases.length - 1)) { i =>
      val expect =
        if (cases(i).isEmpty) 0L
        else cases(i).groupBy(identity).values.map(_.size).max.toLong
      got(i.toLong) == expect
    }
    val res = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("maxRunLength agrees with a brute-force mode count on real docs") {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    // brute force: count each distinct token's occurrences, take the max
    val bruteMode = array_max(transform(array_distinct(col("toks")),
      u => size(filter(col("toks"), t => t === u))))
    val mismatches = docs.select(
        Curation.maxRunLength(col("toks")).as("fast"),
        coalesce(bruteMode.cast("long"), lit(0L)).as("brute"))
      .filter(col("fast") =!= col("brute")).count()
    assert(mismatches == 0)
  }

  test("q87 repetition signals stay in [0,1] and flag real duplication") {
    val out = Curation.q87RepetitionQuality.fn(spark, d).cache()
    try {
      assert(out.count() == Tables.documents(spark, d).count())
      val bad = out.filter(
        col("distinct_token_ratio") < 0 || col("distinct_token_ratio") > 1 ||
        col("dup_trigram_frac") < 0 || col("dup_trigram_frac") > 1 ||
        col("top_token_frac") < 0 || col("top_token_frac") > 1).count()
      assert(bad == 0, "all signal columns must be ratios in [0,1]")
      // the sf0.01 corpus contains documents with repeated trigrams —
      // the signal must light up (vacuity guard)
      assert(out.filter(col("dup_trigram_frac") > 0).count() > 0)
    } finally out.unpersist()
  }

  test("q88 decontamination: semi-join semantics verified brute-force") {
    val out = Curation.q88Decontamination.fn(spark, d).cache()
    try {
      assert(out.count() > 0, "sf0.01 must yield contaminated docs (vacuity guard)")
      assert(out.filter(col("doc_id") % 50 === 0).count() == 0,
        "benchmark documents must never flag themselves")
      // brute force: distinct (doc, gram) pairs, intersect via array overlap
      val grams = Tables.documents(spark, d)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"), array_distinct(Text.shinglesOf(col("toks"), 4)).as("grams"))
      val benchGrams = grams.filter(col("doc_id") % 50 === 0)
        .agg(array_distinct(flatten(collect_list(col("grams")))).as("bg"))
      val brute = grams.filter(col("doc_id") % 50 =!= 0).crossJoin(benchGrams)
        .select(col("doc_id"),
          size(array_intersect(col("grams"), col("bg"))).as("n_hits"))
        .filter(col("n_hits") > 0)
      assert(out.exceptAll(brute).count() == 0 && brute.exceptAll(out).count() == 0,
        "broadcast semi-join must equal the brute-force gram intersection")
    } finally out.unpersist()
  }

  test("q88 plan broadcasts the benchmark side (corpus never shuffles for the join)") {
    val plan = Curation.q88Decontamination.fn(spark, d)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set must broadcast:\n$plan")
  }

  test("q91 cutoff drops exactly the worst floor(n/4) per language") {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), Text.stopwordRatio(col("toks")).as("score"))
    val kept = Curation.q91QualityCutoff.fn(spark, d).select("doc_id", "lang", "score")
    val dropped = docs.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    // the cut property: within a language, every dropped doc sorts
    // strictly below every kept doc in (score, doc_id) order
    val violations = dropped.as("x").join(kept.as("k"),
        col("x.lang") === col("k.lang") &&
        (col("x.score") > col("k.score") ||
         (col("x.score") === col("k.score") && col("x.doc_id") > col("k.doc_id"))))
      .count()
    assert(violations == 0, "cutoff must be a clean suffix per language")
    // exact retention: every language keeps n - floor(n/4)
    val expected = docs.groupBy("lang").agg(count(lit(1)).as("n_all"))
      .select(col("lang"), (col("n_all") - floor(col("n_all") * 0.25)).as("want"))
    val got = kept.groupBy("lang").agg(count(lit(1)).as("got"))
    val off = expected.join(got, Seq("lang"), "left")
      .filter(coalesce(col("got"), lit(0L)) =!= col("want")).count()
    assert(off == 0, "each language must keep exactly n - floor(n/4) documents")
  }

  test("q93 approx twin differs from q91's exact cutoff only at threshold ties") {
    val exact = Curation.q91QualityCutoff.fn(spark, d)
      .select("doc_id", "lang", "score").cache()
    val approx = Curation.q93QualityCutoffApprox.fn(spark, d)
      .select("doc_id", "lang", "score").cache()
    try {
      assert(approx.count() > 0)
      // retention in the same ballpark (the approx threshold keeps ties,
      // so it can only retain MORE than drop-floor(n/4))
      assert(approx.count() >= exact.count())
      val frac = approx.count().toDouble / Tables.documents(spark, d).count()
      assert(frac > 0.70 && frac < 0.90, s"approx retention out of range: $frac")
      // every disagreement must sit exactly ON the language's threshold:
      // the two formulations may only differ in tie-breaking at t.
      // Null-safe join + comparison so a null-lang or null-score
      // divergence COUNTS as a violation instead of vanishing in
      // three-valued logic
      val thresholds = approx.groupBy("lang").agg(min(col("score")).as("t"))
        .withColumnRenamed("lang", "t_lang")
      val sym = approx.exceptAll(exact).unionByName(exact.exceptAll(approx))
      val offTie = sym.join(thresholds, col("lang") <=> col("t_lang"), "left")
        .filter(not(col("score") <=> col("t"))).count()
      assert(offTie == 0,
        "exact and approx cutoffs may only disagree on threshold-tied documents")
    } finally { exact.unpersist(); approx.unpersist() }
  }

  test("a NULL-lang stratum is retained by BOTH cutoff formulations") {
    import spark.implicits._
    // 4 docs in a real language, 4 in the null stratum — each drops
    // exactly its single worst document under either formulation
    val scored = Seq(
      (1L, Some("en"), 0.1), (2L, Some("en"), 0.2), (3L, Some("en"), 0.3), (4L, Some("en"), 0.4),
      (5L, None, 0.1), (6L, None, 0.2), (7L, None, 0.3), (8L, None, 0.4)
    ).toDF("doc_id", "lang", "score")
    val exact = Curation.exactCutoff(scored)
      .collect().map(_.getLong(0)).toSet
    val approx = Curation.approxCutoff(scored)
      .collect().map(_.getLong(0)).toSet
    assert(exact == Set(2L, 3L, 4L, 6L, 7L, 8L),
      s"rank window must treat NULL lang as its own stratum, kept $exact")
    // the threshold formulation keeps the tied boundary docs (score ==
    // t == 0.1) that the rank window tie-breaks away — in BOTH strata
    // symmetrically: the NULL stratum must behave exactly like 'en',
    // not get silently dropped by inner-join null-key semantics
    assert(approx == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L),
      s"threshold keeps boundary ties in the NULL stratum too, kept $approx")
    assert((approx -- exact) == Set(1L, 5L),
      "the twins may differ only at the threshold tie, one per stratum")
  }

  test("q91 drop-count semantics never wipe out a small stratum") {
    import spark.implicits._
    // 1-doc and 3-doc strata keep everything; a 4-doc stratum drops one
    val mini = Seq(
      (1L, "aa", 0.1), (2L, "bb", 0.1), (3L, "bb", 0.2), (4L, "bb", 0.3),
      (5L, "cc", 0.1), (6L, "cc", 0.2), (7L, "cc", 0.3), (8L, "cc", 0.4)
    ).toDF("doc_id", "lang", "score")
    val byLang = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
    val kept = mini
      .withColumn("rn", row_number().over(byLang.orderBy($"score", $"doc_id")))
      .withColumn("n", count(lit(1)).over(byLang))
      .filter($"rn" > floor($"n" * 0.25))
    val perLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == Map("aa" -> 1L, "bb" -> 3L, "cc" -> 3L))
    assert(kept.filter($"lang" === "cc" && $"doc_id" === 5L).count() == 0,
      "the 4-doc stratum must drop its single worst document")
  }

  test("q92 chunks reconstruct the document exactly (overlap dropped, no token lost)") {
    val out = Curation.q92DocChunks.fn(spark, d).cache()
    try {
      assert(out.filter(col("n_chunk_tokens") > 64).count() == 0)
      assert(out.filter(col("n_chunk_tokens") < 1).count() == 0)
      // no redundant packing: every non-first chunk must extend coverage
      // beyond its 16-token overlap (an uncapped stride would emit a
      // trailing chunk that is a strict subset of its predecessor)
      assert(out.filter(col("chunk_idx") > 0 && col("n_chunk_tokens") <= 16).count() == 0,
        "a chunk contributing zero new tokens is duplicated training text")
      // stitch: chunk 0 whole + each later chunk minus its 16-token
      // overlap = the original token stream, for every document
      val stitched = out
        .withColumn("toks", split(col("chunk_text"), " "))
        .withColumn("tail", when(col("chunk_idx") === 0, col("toks"))
          .otherwise(expr("slice(toks, 17, size(toks))")))
        .groupBy(col("doc_id"))
        .agg(flatten(sort_array(collect_list(
          struct(col("chunk_idx"), col("tail")))).getField("tail")).as("rebuilt"))
      val original = Tables.documents(spark, d)
        .select(col("doc_id"), Text.tokens(col("text")).as("orig"))
      val broken = stitched.join(original, Seq("doc_id"))
        .filter(not(col("rebuilt") === col("orig"))).count()
      assert(broken == 0, "overlap-stripped chunk concatenation must equal the token stream")
      // every non-empty doc is chunked
      assert(stitched.count() == original.filter(size(col("orig")) > 0).count())
    } finally out.unpersist()
  }

  test("q89 OOV: every doc present, counts bounded, vocab cut deterministic") {
    val out = Curation.q89VocabOov.fn(spark, d).cache()
    try {
      assert(out.count() == Tables.documents(spark, d).count(),
        "zero-token docs must be retained (explode_outer), none dropped")
      assert(out.filter(col("n_oov") > col("n_tokens")).count() == 0)
      assert(out.filter(col("n_oov") < 0).count() == 0)
      // sf0.01 has 31 distinct tokens and a 20-token vocab → OOV must occur
      assert(out.filter(col("n_oov") > 0).count() > 0, "vacuity guard")
      // determinism: a second run yields the identical relation
      val again = Curation.q89VocabOov.fn(spark, d)
      assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    } finally out.unpersist()
  }

  test("q98 PII scrub redacts crafted emails/IPs/phones and counts them pre-redaction") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "contact bob.smith+spam@ex-ample.co.uk or alice@local.io today"),
      (2L, "server at 192.168.0.1 and 10.0.255.254, port open"),
      (3L, "call +1 (415) 555-0199 or 020 7946 0958 now"),
      (4L, "mixed: a@b.com from 8.8.8.8 dialed +44 7911 123456"),
      (5L, "clean text, no pii at all"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Curation.piiScrub(crafted).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1).getAs[String]("scrubbed") == "contact <EMAIL> or <EMAIL> today")
    assert(out(1).getAs[Long]("n_emails") == 2L)
    assert(out(2).getAs[String]("scrubbed") == "server at <IP> and <IP>, port open")
    assert(out(2).getAs[Long]("n_ips") == 2L)
    assert(out(3).getAs[Long]("n_phones") == 2L)
    assert(!out(3).getAs[String]("scrubbed").exists(_.isDigit),
      s"no digits may survive phone redaction: ${out(3).getAs[String]("scrubbed")}")
    assert(out(4).getAs[Long]("n_emails") == 1L &&
      out(4).getAs[Long]("n_ips") == 1L && out(4).getAs[Long]("n_phones") >= 1L)
    assert(out(5).getAs[String]("scrubbed") == "clean text, no pii at all")
    assert(out(5).getAs[Long]("n_emails") == 0L && out(5).getAs[Long]("n_ips") == 0L &&
      out(5).getAs[Long]("n_phones") == 0L)
    assert(out(6).isNullAt(1) && out(6).isNullAt(2), "null text stays null through scrub")
  }

  test("q99 URL stats count links and distinct hosts, zeros for link-free docs") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "see https://ex.com/a and http://ex.com/b plus https://other.net"),
      (2L, "no links here"),
      (3L, "dup hosts http://a.io/x http://a.io/y http://a.io/z")).toDF("doc_id", "text")
    val out = Curation.urlStats(crafted).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1).getAs[Long]("n_urls") == 3L && out(1).getAs[Long]("n_hosts") == 2L)
    assert(out(2).getAs[Long]("n_urls") == 0L && out(2).getAs[Long]("n_hosts") == 0L)
    assert(out(3).getAs[Long]("n_urls") == 3L && out(3).getAs[Long]("n_hosts") == 1L)
  }

  test("q104 mixture resample: min source keeps all, others land near the uniform target") {
    val spark2 = spark
    val kept = Curation.q104MixtureResample.fn(spark2, d)
      .groupBy(col("source")).agg(count(lit(1)).as("kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark2, d)
      .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCnt = totals.values.min
    val minSource = totals.minBy(_._2)._1
    assert(kept(minSource) == minCnt, "the smallest source must survive whole")
    // every other source is gated toward min_cnt: within binomial noise
    // (sources here are ~25 docs; allow 4·sqrt for the tiny strata)
    totals.foreach { case (src, cnt) =>
      val k = kept.getOrElse(src, 0L)
      assert(k <= cnt)
      val tol = 4 * math.sqrt(minCnt.toDouble) + 2
      assert(math.abs(k - minCnt) <= tol,
        s"source $src kept $k, target $minCnt (cnt $cnt, tol $tol)")
    }
  }

  test("q105 sequence packing: spans are contiguous and cover the token stream exactly") {
    val out = Curation.q105SequencePacking.fn(spark, d)
      .orderBy(col("lang"), col("doc_id")).collect()
    val B = 2048L
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, docs) =>
      var cum = 0L
      var prevLast = 0L
      docs.foreach { r =>
        val n = r.getAs[Long]("n_toks")
        val first = r.getAs[Long]("first_seq")
        val last = r.getAs[Long]("last_seq")
        assert(first == cum / B, "first_seq must be the running-total cut")
        assert(if (n == 0) last == first else last == (cum + n - 1) / B)
        assert(first >= prevLast, "spans may not move backwards")
        assert(n == 0 || first - prevLast <= 1,
          "no empty sequence gaps between consecutive documents")
        cum += n
        prevLast = math.max(prevLast, last)
      }
      // the stream fills ceil(total/B) sequences, no more, no fewer
      if (cum > 0) assert(prevLast == (cum - 1) / B)
    }
  }

  test("q106 pack manifest: sequences reconstruct contiguously, docs split exactly") {
    val B = 2048L
    val rows = Curation.q106PackManifest.fn(spark, d).collect()
    // 1) per (lang, seq): slices tile [0, len] with no gaps or overlaps,
    //    non-final sequences are exactly full
    val byLangSeq = rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("seq_id")))
    val lastSeq = rows.groupBy(_.getAs[String]("lang"))
      .map { case (l, rs) => l -> rs.map(_.getAs[Long]("seq_id")).max }
    byLangSeq.foreach { case ((lang, seq), slices) =>
      val sorted = slices.sortBy(_.getAs[Long]("tok_start"))
      assert(sorted.head.getAs[Long]("tok_start") == 0L,
        s"($lang,$seq) must start at token 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("tok_start") == a.getAs[Long]("tok_end") + 1,
            s"($lang,$seq) has a gap/overlap after doc ${a.getAs[Long]("doc_id")}")
        case _ => ()
      }
      val end = sorted.last.getAs[Long]("tok_end")
      assert(end <= B - 1)
      if (seq != lastSeq(lang)) assert(end == B - 1,
        s"non-final sequence ($lang,$seq) must hold exactly $B tokens, ends at $end")
    }
    // 2) per doc: its slices across sequences sum to n_toks (nothing
    //    lost or duplicated when a document splits at a boundary), and
    //    boundary-straddling documents exist in the corpus at all
    val spans = Curation.q105SequencePacking.fn(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_toks")).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, slices) =>
      val total = slices.map(r => r.getAs[Long]("tok_end") - r.getAs[Long]("tok_start") + 1).sum
      assert(total == spans(doc), s"doc $doc slices sum to $total, expected ${spans(doc)}")
    }
    assert(rows.groupBy(_.getAs[Long]("doc_id")).exists(_._2.length > 1),
      "the corpus must exercise at least one boundary-straddling document")
    // 3) empty docs emit no manifest rows
    val emptyDocs = spans.filter(_._2 == 0L).keySet
    assert(rows.forall(r => !emptyDocs.contains(r.getAs[Long]("doc_id"))))
  }
}
