package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stopword-profile language identification — the classic n-gram/
  * function-word heuristic (Cavnar & Trenkle's rank-profile idea
  * reduced to its robust core): score each document against a small
  * per-language profile of high-frequency function words and predict
  * the argmax. Function words are the strongest single language
  * signal (they top every language's frequency table and rarely
  * cross languages), and a membership count needs no model file —
  * the profiles are literal constants, so the prediction is
  * deterministic and replayable in plain SQL on any engine.
  *
  * Scale shape: map-only — one pass, no shuffle, no UDF (the scorer
  * is a `filter` higher-order function over the token array); widen
  * upstream if the input is few large files. Ties break to the
  * alphabetically FIRST language (fold in sorted order with >=), so
  * the all-zero score row predicts the first profile language rather
  * than flapping.
  */
object LangId {

  /** Top function words per language — literal, tiny, and stable.
    * Swap in corpus-derived profiles for production use; the
    * prediction logic is profile-agnostic. */
  val DefaultProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "de", "que", "y", "los", "una", "las", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "不"))

  /** (idCol, pred_lang, score) + one `s_<lang>` column per profile.
    * `score` is the winning profile's matched-token COUNT (with
    * multiplicity — repeated function words are repeated evidence). */
  def predict(df: DataFrame, idCol: String, textCol: String,
              profiles: Map[String, Seq[String]] = DefaultProfiles): DataFrame = {
    require(profiles.nonEmpty, "LangId.predict: need at least one profile")
    val langs = profiles.keys.toSeq.sorted
    val toks = split(lower(col(textCol)), "\\s+")
    val scored = df.select(
      (col(idCol) +: langs.map { l =>
        val words = array(profiles(l).map(lit): _*)
        size(filter(toks, t => array_contains(words, t))).cast("long").as(s"s_$l")
      }): _*)
    // first-in-sorted-order wins ties: the CASE chain tests langs in
    // alphabetical order with >= against all others — the same chain
    // the SQL oracle writes, so tie behavior is engine-identical
    val pred = langs.foldRight(lit(null).cast("string")) { (l, rest) =>
      val geAll = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o"))
        .reduceOption(_ && _).getOrElse(lit(true))
      when(geAll, lit(l)).otherwise(rest)
    }
    val best: Column =
      if (langs.size == 1) col(s"s_${langs.head}")
      else greatest(langs.map(l => col(s"s_$l")): _*)
    scored.select(
      (col(idCol) +: pred.as("pred_lang") +: best.as("score") +:
        langs.map(l => col(s"s_$l"))): _*)
  }
}
