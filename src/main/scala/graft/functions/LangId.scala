package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stopword-profile language identification.
  *
  * Scores each document against per-language function-word profiles
  * (token-hit counts), plus a CJK-codepoint detector for zh, and takes
  * the argmax with a deterministic tie-break (higher score first, then
  * language code ascending, 'und' when nothing scores). Pure builtin
  * expressions → distributes with no shuffle beyond the scan.
  */
object LangId {

  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "of", "to", "and", "in", "is", "that", "it", "for", "on", "with", "as"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "auf", "für"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "que", "pour", "dans"),
    "pt" -> Seq("o", "a", "os", "as", "de", "que", "e", "em", "um", "uma", "é", "para", "com"))

  /** Adds `pred_lang` (and per-language `score_xx` columns) to a frame
    * with a `text` column. NULL text scores like the empty string →
    * 'und' (null token arrays would otherwise null every score and make
    * the argmax comparator order-dependent). */
  def predict(df: DataFrame): DataFrame = {
    val txt = coalesce(col("text"), lit(""))
    // Bind the token array ONCE (r21): the five per-language filters all
    // reference the tokenizer expression, and inlining it would re-run
    // split(trim(lower(text))) five times per row — the same
    // O(consumers × tokenize) trap [[Text.shinglesOf]]'s scaladoc pins
    // (and the `lang_best` binding below already fixes one level up).
    // CollapseProject keeps the binding projection separate because the
    // alias is non-cheap and multiply-referenced, so each row tokenizes
    // exactly once. Dropped before return — output schema unchanged.
    val toks = col("_langid_toks")
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words.map(lit): _*))).cast("long").as("s"),
        lit(lang).as("l"))
    }
    // zh: any CJK codepoint wins outright (weight 1000)
    val zh = struct(
      when(txt.rlike("[\\u4e00-\\u9fff]"), lit(1000L)).otherwise(lit(0L)).as("s"),
      lit("zh").as("l"))
    val all = array((scored :+ zh): _*)
    val best = element_at(
      array_sort(all, (a, b) =>
        when(a.getField("s") > b.getField("s"), -1)
          .when(a.getField("s") < b.getField("s"), 1)
          .when(a.getField("l") < b.getField("l"), -1)
          .when(a.getField("l") > b.getField("l"), 1)
          .otherwise(0)), 1)
    // Bind the winner struct ONCE: pred_lang references `best` twice
    // (the s=0 test and the l extraction), and inlining it into a single
    // projection would evaluate the whole scoring array_sort twice per
    // row — at gate scale q34's heaviest cost (measured ~2× the per-row
    // work). CollapseProject refuses to merge the two projections
    // because the inner alias is non-cheap and referenced twice, so the
    // sort runs once and the two field reads hit the bound struct.
    df.withColumn("_langid_toks", Text.tokens(lower(txt)))
      .withColumn("lang_best", best)
      .withColumn("pred_lang",
        when(col("lang_best").getField("s") === 0L, lit("und"))
          .otherwise(col("lang_best").getField("l")))
      .drop("lang_best", "_langid_toks")
  }
}
