package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-pipeline surface: token
  * counting, shingling, fingerprinting, quality stats, language ID.
  *
  * All builders are pure `Column` expressions (whole-stage codegen
  * friendly — no UDFs), so they fuse into the scan at 100 TB without
  * breaking pushdown. The wordcount/grep capability they generalize is
  * the reference's `TokenCounterMapper`
  * (hadoop-mapreduce-client-core/.../lib/map/TokenCounterMapper.java:35)
  * and `RegexMapper` (.../lib/map/RegexMapper.java:36).
  */
object TextFunctions {

  /** Whitespace tokens (single-space split: fixture text is
    * space-normalized; use `tokensWs` for arbitrary whitespace). */
  def tokens(c: Column): Column = split(c, " ")

  /** Tokens on runs of whitespace, BPE-ish: punctuation split off. */
  def tokensWs(c: Column): Column =
    split(trim(regexp_replace(c, "(\\p{Punct})", " $1 ")), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-style pre-tokenizer — GPT-2's split pattern minus its
    * trailing-whitespace lookahead (RE2-based engines can't express
    * lookahead, and the oracle runs on one): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs. The
    * resulting count is the standard pre-merge proxy for "how many BPE
    * tokens will this text cost". */
  val bpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(bpePattern), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c)).cast("long")

  /** Distinct word n-gram shingles of `n` consecutive tokens, joined by
    * a single space. Empty array when the document has < n tokens. */
  def wordShingles(c: Column, n: Int): Column = {
    val ws = tokens(c)
    when(size(ws) >= n,
      array_distinct(
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Rolling-fingerprint-style document identity: md5 of the
    * whitespace-normalized, lower-cased text. */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "\\s+", " ").cast("binary"))

  /** Prefix fingerprint over the first `nWords` tokens — catches
    * truncation/extension near-duplicates that full-text hashing misses. */
  def prefixFingerprint(c: Column, nWords: Int): Column =
    md5(concat_ws(" ", slice(tokens(c), 1, nWords)).cast("binary"))

  /** Winnowing rolling-hash fingerprints ([[RollingWinnow]]):
    * sorted distinct window-minimum hashes; any shared substring of
    * `w + k - 1`+ characters guarantees a shared fingerprint —
    * substring-level matching where [[fingerprint]] needs exact
    * equality and MinHash sees only whole-document Jaccard. */
  def rollingFingerprints(c: Column, k: Int = 8, w: Int = 4): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      RollingWinnow(org.apache.spark.sql.graft.ColumnBridge.expression(c), k, w))

  /** Content-defined chunk cut positions ([[CdcCuts]]): 1-based
    * codepoint end positions where the k-char rolling hash hits
    * residue 0 (mod `mod`) — boundaries survive offset shifts, so
    * chunk-level dedup sees through insertions that break fixed-size
    * blocking. */
  def cdcCuts(c: Column, k: Int = 8, mod: Int = 64): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CdcCuts(org.apache.spark.sql.graft.ColumnBridge.expression(c), k, mod))

  /** MD5 per content-defined chunk: split `c` at [[cdcCuts]] and hash
    * each piece. The per-character scan is native; the per-CHUNK
    * substring+md5 transform is a few evaluations per row, where
    * interpreted HOF cost is irrelevant. Empty text → empty array. */
  def cdcChunkHashes(c: Column, k: Int = 8, mod: Int = 64): Column = {
    val bs = array_distinct(concat(array(lit(0)), cdcCuts(c, k, mod),
      array(length(c)))) // 0 never collides (cuts start at k ≥ 1); a
    // cut AT the end collides with length — distinct folds it
    // starts = bs[0..m-2], ends = bs[1..m-1]; m = 1 (empty text)
    // yields two empty slices → empty result, no special case
    zip_with(slice(bs, lit(1), size(bs) - 1), slice(bs, lit(2), size(bs) - 1),
      (s, e) => md5(substring(c, s + 1, e - s).cast("binary")))
  }

  /** Jaro-Winkler similarity ([[JaroWinkler]]): standard p=0.1 /
    * prefix≤4 / boost-threshold-0.7 definition, matching DuckDB's
    * `jaro_winkler_similarity` for oracle parity. */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      JaroWinkler(org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Number of tokens contained in `words` (with multiplicity). */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), w => w.isin(words: _*))).cast("long")

  /** Ratio of non-alphanumeric characters — crude punctuation/noise
    * score (case-insensitive: capitals are letters, not noise). */
  def punctRatio(c: Column): Column =
    length(regexp_replace(lower(c), "[a-z0-9 ]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Composite quality score in [0,1]: penalizes very short docs, high
    * punctuation ratio, and low stopword incidence. Heuristic only —
    * thresholds are engine-defined, deterministic.
    *
    * The token/stopword/punctuation counters come from ONE fused
    * native pass ([[QualityStats]] — optimization r20; the unfused
    * form ran three splits, an interpreted higher-order filter and a
    * regexp_replace per row on every curation-gate row); the double
    * arithmetic below is unchanged from r19, so the scores are
    * bit-identical (QualityStatsSpec pins the parity). */
  def qualityScore(c: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val st = QualityStats(c, stopwords)
    val tok = element_at(st, 1)
    val stop = element_at(st, 2)
    val lenScore = least(tok.cast("double") / lit(20.0), lit(1.0))
    val stopScore = least(stop.cast("double") * lit(4.0) /
      greatest(tok, lit(1L)).cast("double"), lit(1.0))
    val punctScore = lit(1.0) - least(
      (element_at(st, 3).cast("double") /
        greatest(element_at(st, 4), lit(1L)).cast("double")) * lit(4.0), lit(1.0))
    round((lenScore + stopScore + punctScore) / lit(3.0), 4)
  }

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** PII-redaction patterns, shared verbatim with the q67 oracle SQL
    * so both engines run the SAME regex. Deliberately RE2-safe (no
    * lookaround, no backrefs — DuckDB is RE2; `\b`/`\d`/`{m,}` agree
    * between Java regex and RE2 on ASCII). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\+?\\d[\\d\\- ()]{6,}\\d"

  /** Curation-stage PII scrub: emails, dotted-quad IPs, then
    * phone-shaped digit runs become placeholder tokens. Order
    * matters — emails and IPs contain digit runs a later phone pass
    * would otherwise eat. Map-only, codegen'd `regexp_replace`;
    * heuristic by design (a redaction pass at 100 TB is a regex
    * scan, not an NER model) — tune patterns per corpus. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny: language ID at 100 TB must stay a
    * codegen'd expression, not a model call. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "como"),
    "it" -> Seq("il", "gli", "che", "sono", "una", "per", "con"))

  /** Predicted language = marker set with the most hits; ties broken by
    * language code; "und" when nothing matches. */
  def langId(c: Column): Column = {
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordCount(c, words).as("s"), lit(lang).as("l"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }
}
