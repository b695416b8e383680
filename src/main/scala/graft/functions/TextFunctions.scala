package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level text-analysis primitives for large-scale training-data
  * pipelines: token counting, quality signals, language-ID scoring and
  * document fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split, filter, transform, regexp functions, md5) — no Scala UDFs — so the whole
  * document pipeline stays inside WholeStageCodegen and scales linearly
  * with executor count: per-row work only, no shuffles introduced here.
  *
  * Determinism: all outputs are integers, strings, or UNROUNDED single
  * IEEE divisions of exact integers, so results are bit-stable across
  * engines (mirrored in the DuckDB oracle SQL). Rounding is avoided on
  * purpose — see the ratio-column comment below.
  */
object TextFunctions {

  /** whitespace tokens ("\\s+" split, like the reference tokenizer's
    * coarse pass — StatefulWordCount.java:118 splits on \W+) */
  def wsTokens(text: Column): Column = split(text, "\\s+")

  /** whitespace token count */
  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish regex token count: letter runs, digit runs, single symbols */
  val bpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenPattern))

  /** distinct whitespace-token count */
  def uniqTokenCount(text: Column): Column = size(array_distinct(wsTokens(text)))

  /** number of tokens contained in `words` */
  def tokensIn(text: Column, words: Seq[String]): Column =
    size(filter(wsTokens(text), t => t.isin(words.map(lit): _*)))

  /** punctuation character count (chars that are neither word nor space) */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[\\w\\s]", ""))

  /** character count with spaces removed */
  def charCountNoSpace(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  /** CJK character count (zh detection signal) */
  def cjkCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))

  // -- quality scoring ----------------------------------------------------

  val enStop = Seq("the", "a", "of", "and", "to", "in", "is")

  // The ratio columns are single IEEE divisions of exact integers —
  // bit-identical across engines UNROUNDED. Rounding them would be pure
  // risk: an exact-decimal quotient (1/32 = .03125) is a 4-decimal
  // round-half tie where Spark's HALF_UP and DuckDB's nearest-double
  // rounding disagree.

  /** stopword ratio in [0,1] */
  def stopwordRatio(text: Column): Column =
    tokensIn(text, enStop).cast(DoubleType) / tokenCount(text)

  /** mean token length (chars sans whitespace / tokens) */
  def avgTokenLen(text: Column): Column =
    charCountNoSpace(text).cast(DoubleType) / tokenCount(text)

  /** distinct/total token ratio — low values flag boilerplate/spam */
  def uniqRatio(text: Column): Column =
    uniqTokenCount(text).cast(DoubleType) / tokenCount(text)

  /** composite quality heuristic in [0,1]: rewards lexical diversity,
    * penalizes stopword stuffing and degenerate token lengths.
    *
    * 0.4·u/n + 0.3·(1 − s/n) + 0.3·min(1, c/(8n)) evaluated as ONE
    * integer ratio: (128u + 96(n−s) + 12·min(8n, c)) / (320n). A single
    * IEEE division of two exact integers is bit-identical across
    * engines, with no rounding step at all — the float-composite
    * formulation (even from raw ratios) lands on exact decimal
    * round-half boundaries for round-denominator docs (e.g. n=10 →
    * 0.66375), where Spark's HALF_UP and DuckDB's nearest-double
    * rounding disagree in the 4th decimal. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast(LongType)
    val u = uniqTokenCount(text).cast(LongType)
    val s = tokensIn(text, enStop).cast(LongType)
    val c = charCountNoSpace(text).cast(LongType)
    (lit(128L) * u + lit(96L) * (n - s) + lit(12L) * least(lit(8L) * n, c))
      .cast(DoubleType) / (lit(320L) * n).cast(DoubleType)
  }

  // -- language identification -------------------------------------------

  /** marker stopword sets per language (public lists; tiny on purpose —
    * broadcast-free, inlined into codegen) */
  val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  def langScore(text: Column, lang: String): Column =
    tokensIn(text, langMarkers(lang))

  /** argmax over marker scores with CJK override; deterministic
    * alphabetical tie-break (de < en < es < fr) */
  def langGuess(text: Column): Column = {
    val de = langScore(text, "de"); val en = langScore(text, "en")
    val es = langScore(text, "es"); val fr = langScore(text, "fr")
    when(cjkCount(text) > 0, "zh")
      .when(de >= en && de >= es && de >= fr, "de")
      .when(en >= es && en >= fr, "en")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  // -- fingerprinting -----------------------------------------------------

  /** exact-content fingerprint */
  def fingerprint(text: Column): Column = md5(text)

  /** normalization-robust fingerprint: lowercase, collapse whitespace,
    * trim — survives formatting-only edits (the cheap near-dup pass that
    * runs before MinHash at 100 TB scale) */
  def normFingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))
}
