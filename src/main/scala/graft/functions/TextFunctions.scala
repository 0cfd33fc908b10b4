package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the large-scale training-data pipeline
  * scope (BASELINE.json extension surface): token counting, occurrence
  * counting, document fingerprinting, quality scoring, and a marker-word
  * language-ID heuristic. All pure Catalyst expressions — codegen'd, no UDFs —
  * and each is expressible 1:1 in ANSI SQL for the DuckDB oracle.
  */
object TextFunctions {

  /** Single-space tokenization (the harness corpus is single-space word
    * salad); consecutive spaces yield empty tokens in both Spark and DuckDB,
    * keeping the two sides aligned.
    */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** Unicode normalization (NFC + casefold + diacritic strip) — the
    * codegen'd [[NormalizeText]] expression as a Column; SQL twin
    * `graft_normalize_text` via [[graft.GraftExtensions]].
    */
  def normalizeText(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NormalizeText(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Sentence count for readability metrics: terminal-punctuation marks,
    * floored at 1 (a mark-free fragment is one sentence, and the floor
    * keeps the Flesch division defined).
    */
  def sentenceCount(c: Column): Column =
    greatest(regexp_count(c, lit("[.!?]")), lit(1)).cast("long")

  /** Syllable heuristic: contiguous vowel groups (incl. y) over the
    * lowercased text — the standard cheap estimator under Flesch-style
    * scores (exact syllabification needs a dictionary; the group count is
    * within ~10% on English and perfectly reproducible).
    */
  def syllableGroups(c: Column): Column =
    regexp_count(lower(c), lit("[aeiouy]+")).cast("long")

  /** Flesch Reading Ease: `206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words)` — one fixed-shape double expression, so both
    * engines evaluate the identical IEEE operation sequence. Both divisors
    * are ≥ 1 by construction — [[sentenceCount]] floors at 1, and
    * [[tokenCount]] is `size(split(text, ' '))`, which is ≥ 1 for every
    * non-null string (split never returns an empty array; empty text
    * counts its one empty token) — so the divisions are defined under ANSI
    * mode too, with NULL text propagating to a NULL score.
    */
  def fleschReadingEase(c: Column): Column = {
    val w = tokenCount(c).cast("double")
    val s = sentenceCount(c).cast("double")
    val y = syllableGroups(c).cast("double")
    lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (y / w)
  }

  def distinctTokenCount(c: Column): Column = size(array_distinct(tokens(c))).cast("long")

  /** BPE-style pre-tokenizer pattern (the GPT-2 pre-tokenizer shape, ASCII
    * classes, no lookahead): optional-leading-space word / number / punct
    * runs, then lone whitespace. Alternatives are ordered so Java's
    * leftmost-FIRST and RE2/DuckDB's leftmost-LONGEST alternation semantics
    * pick the same match at every position (the space-prefixed alternatives
    * are both longer and earlier), keeping the two engines token-identical.
    */
  val BpeTokenPattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s"

  /** LLM-ish token count: number of BPE-pre-tokenizer segments. A closer
    * proxy for model token cost than whitespace counting (numbers and
    * punctuation split off), used for corpus token budgeting.
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenPattern), lit(0))).cast("long")

  /** Count non-overlapping occurrences of a word (space-delimited) via the
    * pad-replace-length trick — identical left-to-right non-overlapping
    * semantics in Spark's `regexp_replace` and DuckDB's `replace` for a
    * literal pattern.
    */
  def occurrences(c: Column, word: String): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    val target = s" $word "
    ((length(padded) - length(regexp_replace(padded, target, " "))) / lit(target.length - 1))
      .cast("long")
  }

  /** Document fingerprint: md5 over the normalized text. Stable across
    * engines (md5 of the UTF-8 bytes).
    */
  def fingerprint(c: Column): Column = md5(lower(trim(c)))

  /** Marker-word language scores. Deterministic heuristic: count
    * language-characteristic stopwords; highest score wins with a fixed
    * precedence order (en > de > fr > es > zh).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "de" -> Seq("der", "und"),
    "fr" -> Seq("le", "et"),
    "es" -> Seq("el", "y"))

  def langScore(c: Column, markers: Seq[String]): Column =
    markers.map(occurrences(c, _)).reduce(_ + _)

  def predictLang(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(c, ms) }
    // fixed-precedence argmax: first language whose score >= every later score
    def ge(i: Int): Column =
      scores.drop(i + 1).map(s => scores(i)._2 >= s._2).foldLeft(lit(true))(_ && _)
    scores.zipWithIndex.reverse.foldLeft(lit("zh")) { case (els, ((lang, score), i)) =>
      when(score > 0 && ge(i), lit(lang)).otherwise(els)
    }
  }

  /** URL canonicalization — the RefinedWeb / CommonCrawl stage-1 key
    * (Penedo et al. 2023 dedupe by normalized URL before any content
    * dedup, because it is free): lowercase scheme and host, strip the
    * scheme's default port (:80 http, :443 https — a NON-default port is
    * identity), drop the fragment, collapse duplicate path slashes, strip
    * trailing path slashes, remove tracking parameters (utm_*, fbclid,
    * gclid), and SORT the surviving query parameters (param order is not
    * identity). Path and parameter VALUES keep their case — only scheme
    * and host are case-insensitive per RFC 3986 §6.2.2.1. Pure Catalyst
    * string/array expressions with 1:1 DuckDB twins (split_part /
    * list_sort / regexp_replace), so the oracle replays every step.
    * Input contract: an absolute `scheme://host...` URL (the crawl-record
    * shape); non-URL garbage passes through the same deterministic string
    * surgery unharmed rather than throwing.
    */
  def normalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    // head = everything before the query; q = everything after the first ?
    val qPos = instr(noFrag, "?")
    val head = when(qPos > 0, substring(noFrag, lit(1), qPos - 1))
      .otherwise(noFrag)
    val q = when(qPos > 0,
      substring(noFrag, qPos + 1, length(noFrag))).otherwise(lit(""))
    val rawScheme = substring_index(head, "://", 1)
    val scheme = lower(rawScheme)
    // everything after the FIRST "://" — by offset, not by delimiter
    // split: a crawl corpus carries redirect-through URLs with an embedded
    // unencoded URL in the path ('https://a.com/r/https://b.com/x'), and
    // both last-occurrence (substring_index -1) and field-2 (split_part)
    // semantics would mis-parse them
    val afterScheme = substring(head, length(rawScheme) + 4, length(head))
    val hostPort = lower(substring_index(afterScheme, "/", 1))
    val rawPath = substring(afterScheme, length(hostPort) + 1,
      length(afterScheme))
    val host = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path = regexp_replace(regexp_replace(rawPath, "/{2,}", "/"),
      "/+$", "")
    val params = array_join(array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.rlike("^(utm_[a-z]+|fbclid|gclid)="))), "&")
    concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** Quality score in [0,1]-ish: rewards moderate length, word diversity and
    * stopword presence — the shape of a classic crawl-quality filter
    * (length/stopword-ratio features), deterministic integer arithmetic only.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c)
    val nDistinct = distinctTokenCount(c)
    val stop = occurrences(c, "the") + occurrences(c, "a")
    val lenScore = least(nTok.cast("double") / lit(100.0), lit(1.0))
    val diversity = nDistinct.cast("double") / nTok.cast("double")
    val stopRatio = least(stop.cast("double") * lit(10.0) / nTok.cast("double"), lit(1.0))
    lenScore * lit(0.4) + diversity * lit(0.4) + stopRatio * lit(0.2)
  }
}
