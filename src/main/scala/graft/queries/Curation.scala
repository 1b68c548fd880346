package graft.queries

import graft.{Q, Tables}
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a pretraining-data pipeline runs between
  * raw ingest and tokenization: within-document repetition signals
  * (the Gopher-style quality rules), benchmark decontamination
  * (n-gram overlap against an evaluation set), tokenizer-vocabulary
  * coverage (OOV rate), relative quality retention, and context-window
  * chunking. Candidate generation is per-row expressions or
  * hash-shuffle joins — nothing all-pairs, nothing driver-side. Every
  * operator keeps its shape at 100 TB except q91's exact-rank cutoff,
  * which is stratum-bounded by design (see its caveat for the
  * percentile_approx scale twin).
  */
object Curation {

  /** doc_id + materialized token array (shared first stage; the token
    * array MUST be its own column before n-gram transforms — see
    * [[Text.shinglesOf]] for the O(tokens²) regex trap otherwise). */
  private def tokenized(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))

  /** Longest run of one token in the SORTED token array — i.e. the
    * occurrence count of the document's most frequent token — as a
    * single linear per-row fold (state: previous token, current run,
    * best run). Sorting costs O(n log n) per document and the fold is
    * one pass; the naive per-distinct-token count would be O(n·distinct),
    * quadratic on pathological (natural-language-scale) vocabularies.
    * Factored out so the spec can probe it on handcrafted arrays.
    *
    * r21 NOTE — a run-start-position-diff formulation
    * (filter(sequence(1, n), i -> s[i] ≠ s[i−1]) + diffs) was tried and
    * REVERTED: a standalone Column function cannot bind `sort_array`
    * to a name, so every element_at(s, i) inside the lambda re-sorted
    * the whole array — measured 25× slower (27.6 s vs 1.09 s for q87).
    * The fold evaluates sort_array exactly once (aggregate's input
    * child), which is precisely why this shape was right all along. */
  def maxRunLength(toks: Column): Column =
    aggregate(
      sort_array(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Within-document repetition quality signals (the Gopher repetition
    * rules, Rae et al. 2021 §A1.1): distinct-token ratio, duplicate
    * word-trigram fraction, and the fraction of tokens taken by the
    * single most frequent token. Pure per-row array expressions — zero
    * shuffles, stays inside whole-stage codegen, embarrassingly parallel
    * at any scale. The DuckDB oracle replays the exact same fold via
    * list_reduce over a struct accumulator. */
  val q87RepetitionQuality: Q = Q(
    "q87_repetition_quality",
    (s, d) => {
      val base = tokenized(s, d)
        .select(col("doc_id"), col("toks"),
          Text.shinglesOf(col("toks"), 3).as("tri"))
      val n = size(col("toks"))
      base.select(
          col("doc_id"),
          n.as("n_tokens"),
          round(size(array_distinct(col("toks"))).cast("double") /
            greatest(n, lit(1)).cast("double"), 6).as("distinct_token_ratio"),
          when(size(col("tri")) === 0, lit(0.0)).otherwise(
            round(lit(1.0) - size(array_distinct(col("tri"))).cast("double") /
              size(col("tri")).cast("double"), 6)).as("dup_trigram_frac"),
          round(maxRunLength(col("toks")).cast("double") /
            greatest(n, lit(1)).cast("double"), 6).as("top_token_frac"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '[ \t\n\r\f]+') END AS toks
        FROM documents),
      g AS (
        SELECT doc_id, toks,
               list_transform(range(1, greatest(len(toks) - 1, 1)),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tri,
               list_reduce(
                 list_prepend({'prev': '', 'run': CAST(0 AS BIGINT), 'best': CAST(0 AS BIGINT)},
                   list_transform(list_sort(toks),
                     s -> {'prev': s, 'run': CAST(0 AS BIGINT), 'best': CAST(0 AS BIGINT)})),
                 (acc, x) -> CASE WHEN x.prev = acc.prev
                   THEN {'prev': x.prev, 'run': acc.run + 1,
                         'best': greatest(acc.best, acc.run + 1)}
                   ELSE {'prev': x.prev, 'run': CAST(1 AS BIGINT),
                         'best': greatest(acc.best, CAST(1 AS BIGINT))} END
               ).best AS max_run
        FROM t)
      SELECT doc_id,
             len(toks) AS n_tokens,
             round(CAST(len(list_distinct(toks)) AS DOUBLE) /
                   CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS distinct_token_ratio,
             CASE WHEN len(tri) = 0 THEN 0.0
                  ELSE round(1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) /
                             CAST(len(tri) AS DOUBLE), 6) END AS dup_trigram_frac,
             round(CAST(max_run AS DOUBLE) /
                   CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS top_token_frac
      FROM g
      ORDER BY doc_id"""),
    doc = "Gopher-style within-doc repetition quality signals (zero-shuffle)")

  /** Benchmark decontamination: flag corpus documents sharing any word
    * 4-gram with a held-out evaluation set (here: every 50th document
    * plays the benchmark — a deterministic, corpus-derived stand-in).
    * Output: contaminated doc_id + distinct matched-gram count.
    *
    * Scale shape: the benchmark side of the join is an evaluation set
    * (MBs even for large benchmark suites), so it broadcasts and the
    * 100 TB corpus side never shuffles — each task filters its exploded
    * grams against the broadcast hash relation. In production the join
    * key would be xxhash64(gram) (8 bytes instead of the gram string);
    * the string key here keeps the query DuckDB-replayable, and the
    * hash variant is exercised by the MinHash family (q43). */
  val q88Decontamination: Q = Q(
    "q88_decontamination",
    (s, d) => {
      val grams = tokenized(s, d)
        .select(col("doc_id"), explode(Text.shinglesOf(col("toks"), 4)).as("gram"))
      val bench = grams.filter(col("doc_id") % 50 === 0)
        .select(col("gram")).distinct()
      grams.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench), Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("gram")).as("n_hits"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '[ \t\n\r\f]+') END AS toks
        FROM documents),
      g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(toks) - 2, 1)),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS gram
        FROM t),
      bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
      SELECT g.doc_id, count(DISTINCT g.gram) AS n_hits
      FROM g JOIN bench USING (gram)
      WHERE g.doc_id % 50 <> 0
      GROUP BY g.doc_id
      ORDER BY g.doc_id"""),
    doc = "eval-set 4-gram decontamination (broadcast semi-join, corpus never shuffles)")

  /** Tokenizer-vocabulary coverage: build the top-20 corpus vocabulary
    * by token frequency (ties broken lexically so the cut is
    * deterministic on both engines), then score every document's
    * out-of-vocabulary token count and rate.
    *
    * Scale shape: the vocabulary aggregate is a map-side-combined
    * groupBy whose result is top-K rows (constant size — real BPE
    * vocabularies are ≤ a few hundred K entries), so the scoring join
    * broadcasts; the corpus is scanned once and never shuffled. An
    * explode_outer keeps zero-token documents in the result with
    * n_oov = 0 rather than silently dropping them. */
  val q89VocabOov: Q = Q(
    "q89_vocab_oov",
    (s, d) => {
      val docs = tokenized(s, d)
      val vocab = docs.select(explode(col("toks")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(20)
        .select(col("token")).withColumn("in_vocab", lit(1))
      docs.select(col("doc_id"), size(col("toks")).as("n_tokens"),
          explode_outer(col("toks")).as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("doc_id"))
        .agg(
          max(col("n_tokens")).as("n_tokens"),
          sum(when(col("token").isNotNull && col("in_vocab").isNull, 1L)
            .otherwise(0L)).as("n_oov"))
        .withColumn("oov_ratio", round(col("n_oov").cast("double") /
          greatest(col("n_tokens"), lit(1)).cast("double"), 6))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("oov_ratio"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '[ \t\n\r\f]+') END AS toks
        FROM documents),
      v AS (
        SELECT token FROM (SELECT unnest(toks) AS token FROM t) u
        GROUP BY token ORDER BY count(*) DESC, token LIMIT 20),
      vl AS (SELECT list(token) AS vocab FROM v),
      e AS (
        SELECT doc_id, len(toks) AS n_tokens,
               len(list_filter(toks, x -> NOT list_contains(vocab, x))) AS n_oov
        FROM t, vl)
      SELECT doc_id, n_tokens, n_oov,
             round(CAST(n_oov AS DOUBLE) /
                   CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS oov_ratio
      FROM e
      ORDER BY doc_id"""),
    doc = "top-K vocabulary coverage / OOV rate (broadcast vocab, single corpus scan)")

  /** Per-language relative quality filtering: drop the worst ⌊n/4⌋
    * documents of each language by stopword-ratio quality — the
    * retention decision that turns raw quality scores (q31) into a
    * curated corpus. Absolute thresholds misfire across languages (a
    * ratio healthy for German is anemic for English); per-stratum
    * relative cutoffs are how production pipelines filter. The
    * drop-count formulation (rather than `percent_rank >= 0.25`) is
    * deliberate: percent_rank is 0 for a single-row partition, so a
    * rank-threshold cut deletes one-document languages outright and
    * over-drops any small stratum; ⌊n/4⌋ drops nothing until a stratum
    * has 4 documents.
    *
    * Scale shape: one hash shuffle on the stratum key, then a single
    * streaming window pass computes both rank and stratum size. Ties
    * are broken by doc_id so the cut is deterministic and
    * engine-replayable. CAVEAT — the stratum window sorts each language
    * inside ONE task, so per-task work is bounded by the largest
    * stratum (a real corpus is ~half one language): this exact-rank
    * formulation is the oracle-checkable baseline, correct at any size
    * but straggler-bound at extreme strata. The scale path swaps the
    * boundary for a per-language `percentile_approx(score, 0.25)`
    * threshold (partial-aggregated — no single-task sort) and filters
    * `score >= threshold`: same retention decision to sketch accuracy,
    * not hash-checkable because the sketch isn't engine-replayable —
    * the same exact/approx twin pattern as q51/q55. Null ordering is
    * explicit (NULLS FIRST) on both the Spark and oracle sides: Spark
    * ASC defaults to nulls-first while DuckDB defaults to nulls-last,
    * so leaving it implicit would silently diverge the kept sets the
    * moment a null-text document appears. */
  /** Exact-rank retention over a (doc_id, lang, score) frame — q91's
    * core, factored so the null-stratum semantics are unit-testable on
    * handcrafted frames (a NULL lang is its own stratum under
    * partitionBy, exactly like any other language). */
  private[queries] def exactCutoff(scored: DataFrame): DataFrame = {
    val byLang = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    scored
      .withColumn("rn", row_number().over(
        byLang.orderBy(col("score").asc_nulls_first, col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
      .filter(col("rn") > floor(col("n") * 0.25))
      .select(col("doc_id"), col("lang"), col("score"))
  }

  /** Threshold retention over the same frame — q93's core. The join is
    * NULL-SAFE on the stratum key so a NULL-lang stratum gets its own
    * threshold instead of being silently dropped by inner-join key
    * semantics. */
  private[queries] def approxCutoff(scored: DataFrame): DataFrame = {
    val thresholds = scored.groupBy(col("lang"))
      .agg(percentile_approx(col("score"), lit(0.25), lit(10000)).as("q25"))
      .withColumnRenamed("lang", "t_lang")
    scored.join(broadcast(thresholds), col("lang") <=> col("t_lang"))
      .filter(col("score") >= col("q25"))
      .select(col("doc_id"), col("lang"), col("score"))
  }

  /** (doc_id, lang, score) scoring stage shared by q91/q93. */
  private def scoredDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), Text.stopwordRatio(col("toks")).as("score"))

  val q91QualityCutoff: Q = Q(
    "q91_quality_cutoff",
    (s, d) => exactCutoff(scoredDocs(s, d)).orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '[ \t\n\r\f]+') END AS toks
        FROM documents),
      s AS (
        SELECT doc_id, lang,
               round(CAST(len(list_filter(toks,
                       x -> x IN ('the','a','an','of','to','and','in','is'))) AS DOUBLE) /
                     CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS score
        FROM t),
      r AS (
        SELECT doc_id, lang, score,
               row_number() OVER (PARTITION BY lang ORDER BY score NULLS FIRST, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM s)
      SELECT doc_id, lang, score
      FROM r WHERE rn > floor(n * 0.25)
      ORDER BY doc_id"""),
    doc = "per-language relative quality cutoff: drop worst floor(n/4) per stratum")

  /** SCALE TWIN of q91 (the q51/q55 exact/approx pattern): the same
    * per-language retention decision via a `percentile_approx`
    * threshold instead of an exact rank window. The threshold is a
    * partial-aggregated sketch — no per-stratum single-task sort, so
    * this shape survives a 50 TB language — and the corpus is filtered
    * against the broadcast per-language thresholds in one scan.
    * Boundary semantics differ from q91 only at threshold TIES (a
    * threshold keeps every doc scoring exactly t; the rank window
    * tie-breaks by doc_id) — including for a NULL-lang stratum, which
    * the null-safe join thresholds like any other language. A NULL
    * score (null text) sorts worst in q91 and fails the threshold
    * comparison here; the twins coincide whenever null-score docs per
    * stratum ≤ ⌊n/4⌋, the regime of any real corpus. No DuckDB oracle:
    * the sketch is not engine-replayable. CurationSpec pins it to q91
    * instead — the symmetric difference of the two kept-sets must
    * consist solely of threshold-tied documents. */
  val q93QualityCutoffApprox: Q = Q(
    "q93_quality_cutoff_approx",
    (s, d) => approxCutoff(scoredDocs(s, d)).orderBy(col("doc_id")),
    None,
    doc = "q91's scale twin: per-language percentile_approx threshold (no stratum sort)")

  /** Context-window chunking: split every document into fixed-size
    * token chunks (64 tokens, stride 48 → 16-token overlap) — the
    * packing step between curation and tokenization in a training
    * pipeline. Overlap preserves cross-boundary n-grams so no training
    * signal is lost at chunk seams; the chunk index is derived
    * arithmetically from the start offset, keeping the whole operator a
    * per-row explode — zero shuffles besides the presentation sort,
    * embarrassingly parallel at corpus scale.
    *
    * Starts are capped at n−16 so the final chunk always contributes at
    * least one token beyond the overlap: an uncapped stride would emit
    * a fully-redundant trailing chunk (a strict subset of its
    * predecessor) for every document with (n−1) mod 48 ≤ 15 — pure
    * duplicated text in a pipeline whose dedup stages exist to remove
    * exactly that. */
  val q92DocChunks: Q = Q(
    "q92_doc_chunks",
    (s, d) => {
      val n = size(col("toks"))
      val starts = when(n === 0, array().cast("array<int>"))
        .otherwise(sequence(lit(1), greatest(n - 16, lit(1)), lit(48)))
      tokenized(s, d)
        .select(col("doc_id"), col("toks"), posexplode(starts).as(Seq("chunk_idx", "start")))
        .withColumn("chunk", slice(col("toks"), col("start"), lit(64)))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("n_chunk_tokens"),
          concat_ws(" ", col("chunk")).as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '[ \t\n\r\f]+') END AS toks
        FROM documents),
      s AS (
        SELECT doc_id, toks,
               unnest(CASE WHEN len(toks) = 0 THEN []::BIGINT[]
                           ELSE range(1, greatest(len(toks) - 16, 1) + 1, 48) END) AS start
        FROM t),
      c AS (
        SELECT doc_id, CAST((start - 1) // 48 AS INT) AS chunk_idx,
               toks[start : start + 63] AS chunk
        FROM s)
      SELECT doc_id, chunk_idx, len(chunk) AS n_chunk_tokens,
             array_to_string(chunk, ' ') AS chunk_text
      FROM c
      ORDER BY doc_id, chunk_idx"""),
    doc = "context-window chunking: 64-token chunks, 16-token overlap (per-row explode)")

  // ---- PII scrubbing (q98) ----

  /** Redaction patterns, written in the common subset of Java regex and
    * RE2 (no backreferences, no lookaround) so the Spark implementation
    * and the DuckDB oracle run the LITERAL SAME pattern strings. Order
    * matters and is fixed: emails first (an address contains digit runs
    * a later phone pass would mangle), then IPv4, then phone-like digit
    * runs. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d() -]{7,}\\d"

  /** PII scrubbing: replace emails/IPv4s/phone-shaped digit runs with
    * typed placeholder tokens, and report per-document match counts.
    * Pure per-row `regexp_replace`/`regexp_extract_all` expressions —
    * zero shuffles, embarrassingly parallel, the shape that saturates
    * scan bandwidth at 100 TB. Counts are computed on the ORIGINAL
    * text (before any replacement) so the three counters are
    * independent of redaction order. Factored so the spec can probe
    * crafted PII strings; the corpus oracle proves the engines' regex
    * dialects agree on real text. */
  def piiScrub(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("scrubbed"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"))

  val q98PiiScrub: Q = Q(
    "q98_pii_scrub",
    (s, d) => piiScrub(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
                 '$Ipv4Re', '<IP>', 'g'),
               '$PhoneRe', '<PHONE>', 'g') AS scrubbed,
             CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips,
             CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones
      FROM documents
      ORDER BY doc_id"""),
    doc = "PII scrubbing: typed redaction + per-doc match counts, zero shuffles")

  // ---- URL analysis (q99) ----

  /** One capture group — the authority after the scheme, up to the
    * next '/' or whitespace. Common Java/RE2 subset, same literal both
    * engines. */
  val UrlHostRe = "https?://([^/\\s]+)"

  /** Per-document URL statistics: link count and distinct host count —
    * the boilerplate/spam signals (link-farm pages have high URL
    * density) every curation pipeline scores before filtering. Per-row
    * extract + array ops, zero shuffles; emits a row for EVERY document
    * (zeros included) so the result is never empty on a link-free
    * corpus. */
  def urlStats(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(UrlHostRe), lit(1))).cast("long").as("n_urls"),
      size(array_distinct(regexp_extract_all(col("text"), lit(UrlHostRe), lit(1))))
        .cast("long").as("n_hosts"))

  val q99UrlStats: Q = Q(
    "q99_url_stats",
    (s, d) => urlStats(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '$UrlHostRe', 1)) AS BIGINT) AS n_urls,
             CAST(len(list_distinct(regexp_extract_all(text, '$UrlHostRe', 1))) AS BIGINT) AS n_hosts
      FROM documents
      ORDER BY doc_id"""),
    doc = "per-doc URL density + distinct hosts (boilerplate/spam signal), zero shuffles")

  /** Domain-mixture resampling — the "data mixing" step that turns a
    * crawl's accidental source distribution into the training mixture:
    * every source is downsampled toward the SMALLEST source's share
    * (uniform target mix). Selection is the same auditable md5 gate as
    * q38, but the per-source keep-threshold is COMPUTED from corpus
    * counts (floor(min_cnt·65536 / cnt) over the first 16 bits of
    * md5(doc_id)) rather than hard-coded — rerunning after ingest picks
    * up the new counts, and the integer arithmetic replays exactly in
    * any engine. Scale shape: the corpus is scanned once and never
    * shuffled — only the 20-row per-source count table aggregates, and
    * the thresholds broadcast back. */
  val q104MixtureResample: Q = Q(
    "q104_mixture_resample",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      val thr = counts
        .crossJoin(broadcast(counts.agg(min(col("cnt")).as("min_cnt"))))
        .select(col("source"), expr("min_cnt * 65536 DIV cnt").as("thr"))
      val h4 = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
      docs.withColumn("h4", h4)
        .join(broadcast(thr), Seq("source"))
        .filter(col("h4") < col("thr"))
        .select(col("doc_id"), col("source"), col("h4"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH counts AS (
        SELECT source, count(*) AS cnt FROM documents GROUP BY source),
      thr AS (
        SELECT source, (SELECT min(cnt) FROM counts) * 65536 // cnt AS thr
        FROM counts),
      hx AS (
        SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents),
      gated AS (
        SELECT doc_id, source,
               CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096 +
                    (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 256 +
                    (strpos('0123456789abcdef', substring(h, 3, 1)) - 1) * 16 +
                    (strpos('0123456789abcdef', substring(h, 4, 1)) - 1) AS BIGINT) AS h4
        FROM hx)
      SELECT g.doc_id, g.source, g.h4
      FROM gated g JOIN thr t ON t.source = g.source
      WHERE g.h4 < t.thr
      ORDER BY g.doc_id"""),
    doc = "count-derived uniform domain mixture via deterministic md5 gating")

  /** Sequence packing — the step after chunking/tokenization that lays
    * documents head-to-tail into fixed-size training sequences (budget
    * 2048 tokens, document splits allowed: the concat-and-chunk packing
    * every large pretraining run uses, zero padding waste by
    * construction). Within each language stream, documents concatenate
    * in doc_id order; a document's packed span is derived from the
    * RUNNING token total alone (first_seq = start DIV B, last_seq =
    * (end-1) DIV B).
    *
    * Scale shape — a DISTRIBUTED prefix sum, not one window partition
    * per language (which would pull an entire ~20 TB language stream
    * through a single task's sort at 100 TB). doc_id rows are assigned
    * to order-preserving buckets (fixed-width slices of the doc_id
    * range, so bucket i's ids all precede bucket i+1's); the per-
    * (lang, bucket) token subtotals form a tiny table (buckets ×
    * #languages rows) whose exclusive running sum yields each bucket's
    * starting offset; the heavy cumsum then runs as parallel
    * (lang, bucket)-partitioned windows, each adding its bucket's
    * offset. Parallelism is buckets × #languages instead of
    * #languages; the only driver-side data is a 1-row min/max/count
    * agg (bounded, documented). */
  /** (doc_id, lang, n_toks), persisted per corpus (LRU of 1 — same
    * policy and rationale as Dedup's shingle cache): the packing prefix
    * sum reads it TWICE (bucket subtotals, then the cumsum itself), and
    * tokenization dominates the scan — re-persisting a three-narrow-
    * column projection (~24 B/row, spillable) costs far less than
    * tokenizing the corpus twice. Released by [[releaseTokenCounts]]
    * (Verify/Bench/Stress call it after their packing passes). */
  private val tokenCountCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def tokenCounts(s: SparkSession, d: String): DataFrame =
    tokenCountCache.getOrElseUpdate((s, d), {
      tokenCountCache.keys.toSeq.filter(k => k._1 == s && k._2 != d).foreach { k =>
        tokenCountCache.remove(k).foreach(_.unpersist(blocking = true))
      }
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(graft.functions.Text.tokens(col("text"))).cast("long").as("n_toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Release every persisted token-count relation (blocking, so callers
    * can assert the blocks are gone). */
  def releaseTokenCounts(): Unit =
    tokenCountCache.keys.toSeq.foreach { k =>
      tokenCountCache.remove(k).foreach(_.unpersist(blocking = true))
    }

  /** The distributed prefix sum shared by q105/q106: (doc_id, lang,
    * n_toks, cum) where cum is the running per-language token total in
    * doc_id order. See q105's doc-comment for the scale argument. */
  private def packedCum(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokenCounts(s, d)
    // Bounded 1-row collect: global doc_id range for order-preserving buckets.
    val bounds = t.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"),
      count(lit(1)).as("n")).head()
    val nBuckets =
      if (bounds.isNullAt(0)) 1L
      else math.max(s.sessionState.conf.numShufflePartitions.toLong, 1L)
    val lo = if (bounds.isNullAt(0)) 0L else bounds.getLong(0)
    val hi = if (bounds.isNullAt(0)) 0L else bounds.getLong(1)
    val width = math.max((hi - lo) / nBuckets + 1L, 1L)
    val bucketed = t.withColumn("bucket",
      expr(s"(doc_id - ${lo}L) DIV ${width}L"))
    // Tiny (buckets x #langs) subtotal table -> exclusive running offsets.
    val wOff = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("lang"), col("bucket"))
      .agg(sum(col("n_toks")).as("sub"))
      .withColumn("off", coalesce(sum(col("sub")).over(wOff), lit(0L)))
      .drop("sub")
    // Heavy cumsum: parallel per-(lang, bucket) windows + bucket offset.
    val wLocal = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets), Seq("lang", "bucket"))
      .withColumn("cum", col("off") + sum(col("n_toks")).over(wLocal))
      .select(col("doc_id"), col("lang"), col("n_toks"), col("cum"))
  }

  val q105SequencePacking: Q = Q(
    "q105_sequence_packing",
    (s, d) =>
      packedCum(s, d)
        .select(col("doc_id"), col("lang"), col("n_toks"),
          expr("(cum - n_toks) DIV 2048").as("first_seq"),
          expr("CASE WHEN n_toks = 0 THEN (cum - n_toks) DIV 2048 " +
               "ELSE (cum - 1) DIV 2048 END").as("last_seq"))
        .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f]+'))
                    END AS BIGINT) AS n_toks
        FROM documents),
      c AS (
        SELECT doc_id, lang, n_toks,
               sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT doc_id, lang, n_toks,
             CAST((cum - n_toks) // 2048 AS BIGINT) AS first_seq,
             CAST(CASE WHEN n_toks = 0 THEN (cum - n_toks) // 2048
                       ELSE (cum - 1) // 2048 END AS BIGINT) AS last_seq
      FROM c
      ORDER BY doc_id"""),
    doc = "concat-and-chunk sequence packing: distributed prefix sum " +
      "(bucket subtotals -> broadcast offsets -> parallel local cumsums)")

  /** Pack-manifest materialization — the row set a training-data loader
    * actually consumes: q105's per-document spans exploded into one row
    * per (sequence, document-slice), with SEQUENCE-LOCAL token bounds.
    * A document crossing sequence boundaries contributes one slice per
    * sequence it touches (`sequence(first, last)` + explode — per-row
    * generators, no extra shuffle beyond q105's own), so every sequence
    * reads as a contiguous [0, 2047] layout: slice k of a sequence
    * starts where slice k-1 ended, non-final sequences sum to exactly
    * 2048 tokens, and the final sequence of each language stream ends
    * early (CurationSpec's reconstruction test asserts all three).
    * Empty documents (n_toks = 0) occupy no tokens and emit no rows. */
  val q106PackManifest: Q = Q(
    "q106_pack_manifest",
    (s, d) =>
      packedCum(s, d)
        .filter(col("n_toks") > 0)
        .select(col("doc_id"), col("lang"),
          (col("cum") - col("n_toks")).as("tstart"),
          (col("cum") - lit(1L)).as("tend"))
        .withColumn("seq_id",
          explode(sequence(expr("tstart DIV 2048"), expr("tend DIV 2048"))))
        .select(col("lang"), col("seq_id"), col("doc_id"),
          (greatest(col("tstart"), col("seq_id") * 2048L) -
            col("seq_id") * 2048L).as("tok_start"),
          (least(col("tend"), col("seq_id") * 2048L + 2047L) -
            col("seq_id") * 2048L).as("tok_end"))
        .orderBy(col("lang"), col("seq_id"), col("tok_start")),
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f]+'))
                    END AS BIGINT) AS n_toks
        FROM documents),
      c AS (
        SELECT doc_id, lang, n_toks,
               sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t),
      spans AS (
        SELECT doc_id, lang, CAST(cum - n_toks AS BIGINT) AS tstart,
               CAST(cum - 1 AS BIGINT) AS tend
        FROM c WHERE n_toks > 0),
      ex AS (
        SELECT lang, doc_id, tstart, tend,
               unnest(generate_series(tstart // 2048, tend // 2048)) AS seq_id
        FROM spans)
      SELECT lang, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
             CAST(greatest(tstart, seq_id * 2048) - seq_id * 2048 AS BIGINT) AS tok_start,
             CAST(least(tend, seq_id * 2048 + 2047) - seq_id * 2048 AS BIGINT) AS tok_end
      FROM ex
      ORDER BY lang, seq_id, tok_start"""),
    doc = "training-sequence manifest: per-(sequence, doc-slice) rows with " +
      "sequence-local bounds; documents split across sequence boundaries")

  def defs: Seq[Q] = Seq(q87RepetitionQuality, q88Decontamination, q89VocabOov,
    q91QualityCutoff, q92DocChunks, q93QualityCutoffApprox, q98PiiScrub, q99UrlStats,
    q104MixtureResample, q105SequencePacking, q106PackManifest)
}
