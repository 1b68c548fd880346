package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / fingerprint operators.
  *
  * Everything here is built from Spark builtin (codegen'd) functions and
  * higher-order array functions — no Scala UDFs in the per-row hot path —
  * so the expressions stay inside WholeStageCodegen and distribute
  * trivially.
  */
object Text {

  /** Shared English stopword probe set (quality scoring + pipeline). */
  val stopwordsEn: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is")

  /** The tokenizer's whitespace class, spelled explicitly: Java regex
    * `\s` includes vertical tab (\x0B) while RE2-family engines (the
    * oracle) exclude it, so `\s+` would tokenize a \x0B-bearing document
    * differently across engines. The explicit class is identical in
    * both. Oracle SQL spells the identical class in its regex literals. */
  val WhitespaceClass: String = "[ \\t\\n\\r\\f]+"

  /** Whitespace tokens of trimmed text ([] for blank input). */
  def tokens(text: Column): Column = {
    val t = split(trim(text), WhitespaceClass)
    when(length(trim(text)) === 0, array().cast("array<string>")).otherwise(t)
  }

  /** Word n-gram shingles over an ALREADY-MATERIALIZED token array
    * column. Callers must project `tokens(text)` into its own column
    * first: inlining the split() expression here would re-tokenize the
    * document inside every element_at of the transform lambda — an
    * O(tokens²) regex blowup that Catalyst's projection collapse rules
    * avoid only when the array is a plain attribute reference. */
  def shinglesOf(toks: Column, n: Int): Column = {
    val count = greatest(size(toks) - (n - 1), lit(0))
    // sequence(1, count) is empty-safe via the greatest() clamp
    when(count === 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), count),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
  }

  /** Convenience one-shot form (fine for tests / tiny inputs; hot paths
    * should materialize tokens and use shinglesOf). */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** Occurrence count of the stopword-probe tokens in a token array —
    * the shared numerator of the quality scores (q31's stop_ratio,
    * q80's integer gate, q91's retention cutoff). One definition so the
    * scoring rule cannot drift between the scorer and its consumers. */
  def stopwordHits(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwordsEn.map(lit): _*)))

  /** Stopword-ratio quality score in [0,1], rounded to 6 dp for exact
    * cross-engine parity (both engines divide identical integers). */
  def stopwordRatio(toks: Column): Column =
    round(stopwordHits(toks).cast("double") /
      greatest(size(toks), lit(1)).cast("double"), 6)

  /** Order-sensitive 64-bit rolling fingerprint: chained
    * xxhash64(accumulator, token) fold over the token stream. The chain
    * makes it position-sensitive (a swap changes the value); xxhash
    * mixing avoids ANSI-mode overflow that a multiply-based rolling hash
    * would trip. */
  def fingerprint64(text: Column): Column =
    aggregate(
      tokens(text),
      lit(-3750763034362895579L),
      (acc, t) => xxhash64(acc, t))

  /** Order-sensitive rolling fingerprint in oracle-expressible form: a
    * chained md5(acc ++ token) fold over the token stream. Same chain
    * shape as [[fingerprint64]] (a swap changes the value) but built on
    * md5, which any ANSI-ish engine can replay —
    * `list_reduce(list_prepend(seed, tokens), (acc,t) -> md5(acc||t))`
    * in DuckDB. Use fingerprint64 when raw speed matters and no
    * external verification is needed. */
  def fingerprintMd5(text: Column, seed: String = "graft"): Column =
    aggregate(
      tokens(text),
      lit(seed),
      (acc, t) => md5(concat(acc, t)))

}
