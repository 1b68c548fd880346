package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, n-gram frequency (generator/explode surface), and
  * language identification. All stay inside whole-stage codegen
  * (builtin functions only) except lang-id, which is a Catalyst-friendly
  * heuristic over stopword hit counts.
  */
object TextOps {

  /** Token counts via whitespace split — the "BPE-ish regex" baseline. */
  val q30TokenStats: Q = Q(
    "q30_token_stats",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          length(col("text")).as("text_len"),
          size(graft.functions.Text.tokens(col("text"))).as("n_tokens"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, length(text) AS text_len,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f]+')) END AS n_tokens
      FROM documents
      ORDER BY doc_id"""),
    doc = "whitespace tokenization stats")

  /** Quality scoring: length / punctuation ratio / stopword ratio /
    * mean token length — per-row double arithmetic (deterministic). */
  val q31QualityScore: Q = Q(
    "q31_quality_score",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // materialize the token array before fanning out to the four
      // consumers (r21): inlined, the split-tokenize tree is duplicated
      // into every consumer expression and runs ~5× per row — the
      // [[graft.functions.Text.shinglesOf]] trap. The binding projection
      // survives CollapseProject (non-cheap alias, multiply referenced).
      val tokArr = col("_toks")
      val toks = size(tokArr)
      docs.select(col("doc_id"), col("text"),
          graft.functions.Text.tokens(col("text")).as("_toks"))
        .select(
          col("doc_id"),
          toks.as("n_tokens"),
          graft.functions.Text.stopwordHits(tokArr).as("n_stop"),
          graft.functions.Text.stopwordRatio(tokArr).as("stop_ratio"),
          round(length(col("text")).cast("double") / greatest(toks, lit(1)).cast("double"), 6)
            .as("chars_per_token"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f]+')) END AS n_tokens,
               len(list_filter(regexp_split_to_array(trim(text), '[ \t\n\r\f]+'),
                   x -> x IN ('the','a','an','of','to','and','in','is'))) AS n_stop
        FROM documents)
      SELECT doc_id, n_tokens, n_stop,
             round(CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS stop_ratio,
             round(CAST(length(text) AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS chars_per_token
      FROM t
      ORDER BY doc_id"""),
    doc = "document quality heuristics")

  /** Token frequency via explode (the Generator/UDTF surface, SURVEY §2.10). */
  val q32TokenFreq: Q = Q(
    "q32_token_freq",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(trim(col("text")), graft.functions.Text.WhitespaceClass)).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50),
    Some("""
      SELECT token, count(*) AS n
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '[ \t\n\r\f]+')) AS token
            FROM documents) t
      WHERE length(token) > 0
      GROUP BY token
      ORDER BY n DESC, token
      LIMIT 50"""),
    doc = "explode/unnest generator + frequency top-k")

  /** Deterministic rolling fingerprint: a chained md5(acc ++ token)
    * fold over the token stream (order-sensitive — a token swap changes
    * the value). The md5 chain is replayed verbatim by the DuckDB
    * oracle via list_reduce, so this is fully hash-checked; the faster
    * xxhash64 variant (Text.fingerprint64) keeps its own ScalaTest. */
  val q33Fingerprint: Q = Q(
    "q33_fingerprint",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.Text.fingerprintMd5(col("text")).as("fp"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 'graft'
                  ELSE list_reduce(
                         list_prepend('graft', regexp_split_to_array(trim(text), '[ \t\n\r\f]+')),
                         (acc, t) -> md5(acc || t)) END AS fp
      FROM documents
      ORDER BY doc_id"""),
    doc = "rolling fingerprint (chained md5 over tokens)")

  /** Language identification: stopword-profile heuristic scored per
    * language, argmax with deterministic tie-break (score desc, then
    * language code asc, 'und' when nothing scores). The scoring is pure
    * expression arithmetic, so the DuckDB oracle replays it exactly:
    * per-language token-hit counts, the CJK detector, and the argmax
    * via lexicographic struct sort over (-score, lang). Accuracy is
    * additionally asserted in ScalaTest. */
  val q34LangId: Q = Q(
    "q34_lang_id",
    (s, d) =>
      graft.functions.LangId.predict(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"), col("pred_lang"))
        .orderBy(col("doc_id")),
    Some {
      def hits(lang: String): String = {
        val words = graft.functions.LangId.profiles(lang)
          .map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(toks, x -> x IN ($words))) AS BIGINT) AS s_$lang"
      }
      s"""
      WITH t AS (
        -- coalesce mirrors Spark's NULL-text → empty-string scoring path
        SELECT doc_id, lang, coalesce(text, '') AS text,
               regexp_split_to_array(trim(lower(coalesce(text, ''))), '[ \\t\\n\\r\\f]+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id, lang,
               ${Seq("de", "en", "es", "fr", "pt").map(hits).mkString(",\n               ")},
               CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')
                    THEN CAST(1000 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS s_zh
        FROM t),
      b AS (
        SELECT doc_id, lang,
               list_sort([{'s': -s_de, 'l': 'de'}, {'s': -s_en, 'l': 'en'},
                          {'s': -s_es, 'l': 'es'}, {'s': -s_fr, 'l': 'fr'},
                          {'s': -s_pt, 'l': 'pt'}, {'s': -s_zh, 'l': 'zh'}])[1] AS best
        FROM s)
      SELECT doc_id, lang,
             CASE WHEN best.s = 0 THEN 'und' ELSE best.l END AS pred_lang
      FROM b
      ORDER BY doc_id"""
    },
    doc = "n-gram/stopword language-ID heuristic (oracle-replayed scoring)")

  /** BPE-ish regex tokenization (GPT-2-style pre-tokenizer pattern:
    * contractions, letter runs, digit runs, punctuation runs, each with
    * optional leading space). Same RE2/Java-compatible pattern on both
    * engines — no lookahead. */
  val q35BpeTokens: Q = Q(
    "q35_bpe_tokens",
    (s, d) => {
      // whitespace spelled explicitly: Java \s includes \x0B, RE2's does not
      val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?[\\p{L}]+| ?[\\p{N}]+| ?[^ \\t\\n\\r\\f\\p{L}\\p{N}]+"
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             len(regexp_extract_all(text,
               '''s|''t|''re|''ve|''m|''ll|''d| ?[\p{L}]+| ?[\p{N}]+| ?[^ \t\n\r\f\p{L}\p{N}]+'))
               AS n_bpe_tokens
      FROM documents
      ORDER BY doc_id"""),
    doc = "BPE-style regex pre-tokenization count")

  /** Deterministic stratified sampling — the language-rebalancing step
    * of a training-data pipeline (downsample the dominant language,
    * keep the tail). Selection is a pure function of doc_id (byte 0 of
    * md5(doc_id) under a per-language threshold), so the sample is
    * reproducible across runs, partitionings, and ENGINES: DuckDB
    * replays the identical selector, making even this "random" sample
    * hash-checkable. `rand()`-based sampling can't be verified and
    * resamples differently per run; hash-gating is how production
    * pipelines make sampling auditable. */
  val q38StratifiedSample: Q = Q(
    "q38_stratified_sample",
    (s, d) => {
      // b0 = first byte of md5(doc_id) ∈ [0, 256)
      val b0 = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int")
      Tables.documents(s, d)
        .withColumn("b0", b0)
        .filter(
          (col("lang") === "en" && col("b0") < 128) ||   // en: keep 1/2
          (col("lang") === "de" && col("b0") < 64) ||    // de: keep 1/4
          (col("lang") =!= "en" && col("lang") =!= "de")) // tail: keep all
        .select(col("doc_id"), col("lang"), col("b0"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH h AS (
        SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hx
        FROM documents),
      b AS (
        SELECT doc_id, lang,
               (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
               (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS b0
        FROM h)
      SELECT doc_id, lang, b0
      FROM b
      WHERE (lang = 'en' AND b0 < 128)
         OR (lang = 'de' AND b0 < 64)
         OR (lang <> 'en' AND lang <> 'de')
      ORDER BY doc_id"""),
    doc = "deterministic per-language stratified sample (md5-gated)")

  /** Text normalization + character-class quality ratios: NFC
    * normalization, lowercasing, punctuation stripping, and
    * punct/digit/upper counts — per-row, fully oracle-checked. */
  val q36TextNormalize: Q = Q(
    "q36_text_normalize",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          lower(col("text")).as("lowered"),
          // whitespace spelled explicitly: Java \s includes \x0B, RE2's does not
          regexp_replace(col("text"), "[^\\p{L}\\p{N} \\t\\n\\r\\f]", "").as("depunct"),
          length(regexp_replace(col("text"), "[^\\p{P}]", "")).as("n_punct"),
          length(regexp_replace(col("text"), "[^0-9]", "")).as("n_digit"),
          length(regexp_replace(col("text"), "[^A-Z]", "")).as("n_upper"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             lower(text) AS lowered,
             regexp_replace(text, '[^\p{L}\p{N} \t\n\r\f]', '', 'g') AS depunct,
             length(regexp_replace(text, '[^\p{P}]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
      FROM documents
      ORDER BY doc_id"""),
    doc = "normalization + char-class quality counts")

  /** Corpus-trained bigram language-model scoring — the classic
    * perplexity-filter proxy (CCNet/KenLM-style) with a model small
    * enough to train in the same job: Laplace-smoothed bigram
    * probabilities p(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V) are estimated
    * from the WHOLE corpus in one pass, then every document is scored
    * by its mean negative log-likelihood per bigram. High avg_nll =
    * improbable token transitions = the documents a quality filter
    * drops.
    *
    * Scale shape: the two count tables are bounded by observed-vocab
    * sizes, not corpus size — they partial-aggregate map-side and
    * broadcast back (OperatorSpec pins the plan: both joins resolve to
    * BroadcastHashJoin, so the per-bigram corpus stream never shuffles);
    * the vocabulary size V is a single scalar crossed in via a 1-row
    * broadcast (same idiom as q104). If a web-scale bigram table ever
    * outgrew the broadcast threshold, the fallback is a shuffle hash
    * join keyed on (w1,w2)/(w1) — the corpus side then shuffles once
    * per join, and the hot-head keys ("the", "of") want the
    * [[graft.operators.SkewJoin]] salting helper on the cleft join;
    * AQE's skew-join split handles moderate skew unaided. The corpus
    * itself is scanned once and never collected. Double summation is
    * rounded to 6 dp after the per-doc mean so both engines' reduction
    * orders agree. */
  val q112BigramLm: Q = Q(
    "q112_bigram_lm",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("t"))
      val bi = toks
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("w1"),
                        element_at(col("t"), i + 1).as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val cbi = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cbi"))
      // cleft(w1) = Σ_w2 cbi(w1, w2) exactly (integer sums over the same
      // bigram instances) — r21 derives it from the distinct-bigram
      // relation instead of re-running the tokenize + bigram-explode
      // corpus pass a third time; the sum's input is |distinct bigrams|,
      // not |bigram instances|
      val cleft = cbi.groupBy(col("w1")).agg(sum(col("cbi")).as("cleft"))
      val vocab = toks.select(explode(col("t")).as("w"))
        .agg(countDistinct(col("w")).as("v"))
      // explicit broadcasts: without the hint AQE reuses the count
      // tables' aggregation shuffles and SMJ-joins — which re-shuffles
      // the per-bigram corpus stream once per join; the hint keeps the
      // corpus pipeline shuffle-free end to end
      bi.join(broadcast(cbi), Seq("w1", "w2"))
        .join(broadcast(cleft), Seq("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          log((col("cbi") + 1).cast("double") / (col("cleft") + col("v")).cast("double"))
            .as("lp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
             round(-sum(col("lp")) / count(lit(1)), 6).as("avg_nll"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(text), '[ \t\n\r\f]+') END AS t
        FROM documents),
      bi AS (
        -- unnest(range(...)) instead of a lateral generate_series: this
        -- DuckDB build rejects column params in lateral table functions
        SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
      cbi AS (SELECT w1, w2, count(*) AS cbi FROM bi GROUP BY w1, w2),
      cleft AS (SELECT w1, count(*) AS cleft FROM bi GROUP BY w1),
      vocab AS (SELECT count(DISTINCT w) AS v
                FROM (SELECT unnest(t) AS w FROM toks)),
      scored AS (
        SELECT b.doc_id,
               ln(CAST(c.cbi + 1 AS DOUBLE) / CAST(l.cleft + v.v AS DOUBLE)) AS lp
        FROM bi b
        JOIN cbi c ON b.w1 = c.w1 AND b.w2 = c.w2
        JOIN cleft l ON b.w1 = l.w1
        CROSS JOIN vocab v)
      SELECT doc_id, count(*) AS n_bigrams,
             round(-sum(lp) / count(*), 6) AS avg_nll
      FROM scored
      GROUP BY doc_id
      ORDER BY doc_id"""),
    doc = "corpus-trained bigram LM: per-doc mean NLL (perplexity-filter proxy)")

  /** Okapi BM25 document ranking (k1 = 1.2, b = 0.75) for a fixed
    * keyword query — the retrieval staple of training-data curation
    * (targeted corpus slicing, contamination hunting, topical
    * resampling). Entirely relational: one tokenize pass feeds the
    * (doc, token) tf table; doc length is derived from tf itself
    * (sum of tf per doc — no second tokenize); idf comes from a
    * term-filtered df aggregate. The ONLY corpus-sized relations are
    * the tf stream (shuffles once on (doc_id, token) for the counts)
    * and the dl join; the query-term filter prunes the postings to
    * |matching terms| rows BEFORE the idf join and score sum, and
    * df / N / avgdl are broadcast scalars/tiny maps — so at 100 TB the
    * scoring stage is sized by the postings of 4 terms, not the
    * corpus. row_number over the scored docs is rank-pushed
    * (WindowGroupLimit) — no global sort materializes. ln on both
    * engines (q112 precedent); hash-checked end to end. */
  /** The BM25 pipeline as a reusable ranked relation (rk, doc_id,
    * score): callers filter `rk <= N` — the filter-on-row_number shape
    * Spark rewrites to a rank-pushed WindowGroupLimit, so no caller
    * materializes a global sort. Shared by q121 (keyword retrieval,
    * top-10) and q123 (hybrid RRF fusion, top-20 arm). */
  private[queries] def bm25Ranked(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame =
    bm25RankedWith(s, d, Seq("table", "vector", "customer", "stream"))

  /** [[bm25Ranked]] for an arbitrary term set — the direct-pipeline
    * reference the persisted-index property fuzz compares against. */
  private[graft] def bm25RankedWith(s: org.apache.spark.sql.SparkSession,
                                    d: String, terms: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("t"))
    val tf = toks
      .select(col("doc_id"), explode(col("t")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    // dl = Σ_token tf(doc, token) ≡ size(tokens) per doc, exactly (both
    // count every token instance; tf rows exist only for docs with ≥ 1
    // token, so the size > 0 filter keeps the SAME doc set). r21: the
    // r20 shape re-ran the tokenize + explode + (doc_id, token) shuffle
    // + second aggregate just to re-derive the per-doc token count the
    // token array already carries — this drops the query's one
    // corpus-sized unfiltered shuffle (the postings arm's shuffle is
    // term-filtered before the exchange). Guide §2.4: remove shuffles
    // outright.
    val dl = toks.filter(size(col("t")) > 0)
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val avgdl = dl.agg(avg(col("dl")).as("avgdl"))
    val postings = tf.filter(col("token").isin(terms: _*))
    val df = postings.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = postings
      .join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(nDocs)).crossJoin(broadcast(avgdl))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("term_score"))
      .groupBy(col("doc_id")).agg(sum(col("term_score")).as("score"))
    // rank on the ROUNDED score (the precision the output reports):
    // mathematically tied docs (e.g. replicated corpora) pick up
    // last-bit noise from the term-score summation order, and two
    // plans of the same query would break such ties differently —
    // rounding first makes the order a pure function of the data,
    // ties then resolved by doc_id
    val w = Window.orderBy(round(col("score"), 6).desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
  }

  /** The BM25 replay as a CTE fragment (appended after an open `WITH`):
    * k-prefixed names so it composes with the IVF CTE chain inside one
    * statement (q123). Ends at `kranked(doc_id, score, rk)`. */
  private[queries] val bm25Ctes: String = """
      ktoks AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(text), '[ \t\n\r\f]+') END AS t
        FROM documents),
      ktf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest(t) AS token FROM ktoks)
        GROUP BY doc_id, token),
      kdl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM ktf GROUP BY doc_id),
      kstats AS (
        SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM kdl),
      kpostings AS (
        SELECT * FROM ktf WHERE token IN ('table', 'vector', 'customer', 'stream')),
      kdf AS (SELECT token, count(*) AS df FROM kpostings GROUP BY token),
      kscored AS (
        SELECT p.doc_id,
               ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5)) *
               (p.tf * 2.2) /
               (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS term_score
        FROM kpostings p
        JOIN kdf f ON p.token = f.token
        JOIN kdl l ON p.doc_id = l.doc_id
        CROSS JOIN kstats s),
      kagg AS (SELECT doc_id, sum(term_score) AS score FROM kscored GROUP BY doc_id),
      kranked AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rk
        FROM kagg)"""

  /** The full q121 replay — also pins q127/q128 (the persisted /
    * incrementally-maintained inverted index must be indistinguishable
    * from scoring the corpus directly). */
  private[queries] val bm25OracleSql: String = s"""
      WITH$bm25Ctes
      SELECT rk, doc_id, round(score, 6) AS bm25_r
      FROM kranked WHERE rk <= 10
      ORDER BY rk"""

  val q121Bm25: Q = Q(
    "q121_bm25",
    (s, d) =>
      bm25Ranked(s, d).filter(col("rk") <= 10)
        .select(col("rk"), col("doc_id"), round(col("score"), 6).as("bm25_r"))
        .orderBy(col("rk")),
    Some(bm25OracleSql),
    doc = "Okapi BM25 keyword ranking (tf/df/dl relational pipeline)")

  def defs: Seq[Q] = Seq(q30TokenStats, q31QualityScore, q32TokenFreq,
    q33Fingerprint, q34LangId, q35BpeTokens, q36TextNormalize,
    q38StratifiedSample, q112BigramLm, q121Bm25)
}
