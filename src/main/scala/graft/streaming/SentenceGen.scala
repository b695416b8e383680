package graft.streaming

import scala.util.Random

/** Deterministic dictionary-backed random sentence generator — the engine
  * analog of the reference's RandomSentenceGenerator.java:33-53 (uniform
  * word draws from a large dictionary, optional skew knob that emits the
  * literal word "skew" with probability skewPercent%).
  *
  * The default-size dictionary IS the reference's: the 354,986-line
  * words.txt (RandomSentenceGenerator.java:23-31) ships as the engine
  * resource graft/words.txt — entry lengths 0-31 chars, 3,869 apostrophe
  * tokens (`'d`, `'em`, possessives), a handful of non-alphabetic
  * entries (`&c`) — so word-length and character distributions match the
  * reference byte-for-byte. Any other dictSize gets the synthesized
  * seeded fallback below (used by tests and the deterministic w04
  * profile, where sentence shape must be provable arithmetic).
  *
  * Difference from the reference, on purpose: generation is seeded per
  * call-site (the reference uses an unseeded Random —
  * RandomSentenceGenerator.java:15), because the oracle checks need
  * reproducible streams (SURVEY.md §7.4).
  */
object SentenceGen {

  val DefaultDictSize = 354986

  /** the reference's literal words.txt, loaded once per JVM */
  lazy val realDictionary: Array[String] = {
    val in = getClass.getResourceAsStream("/graft/words.txt")
    require(in != null, "resource graft/words.txt missing")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
    finally in.close()
  }

  /** The dictionary for a run: the real words.txt at the default size,
    * else a deterministic synthesized fallback — lowercase pseudo-words
    * (some with apostrophes: possessives/contractions and bare elisions
    * like "'d", matching words.txt's token classes) so the `\W+`
    * multi-token and leading-empty-split tokenizer paths stay exercised
    * at every dictSize. */
  def dictionary(dictSize: Int = DefaultDictSize, seed: Long = 42L): Array[String] = {
    if (dictSize == DefaultDictSize) return realDictionary
    val rnd = new Random(seed)
    val suffixes = Array("'s", "'d", "'em", "'ll", "'t")
    Array.fill(dictSize) {
      val len = 3 + rnd.nextInt(7)
      val sb = new StringBuilder(len)
      var i = 0
      while (i < len) { sb.append(('a' + rnd.nextInt(26)).toChar); i += 1 }
      if (rnd.nextInt(100) < 3) {
        val suf = suffixes(rnd.nextInt(suffixes.length))
        if (rnd.nextInt(10) == 0) suf // bare elision token, words.txt-style
        else sb.toString + suf
      } else sb.toString
    }
  }

  /** One sentence of `size` words drawn uniformly from `dict` by a caller-
    * owned Random; with probability skewPercent% the sentence is the hot
    * word "skew" repeated (reference RandomSentenceGenerator.java:47-53
    * emits the literal "skew " sentence under the skew knob). */
  def nextSentence(rnd: Random, dict: Array[String], size: Int,
                   skewPercent: Int = 0): String = {
    if (skewPercent > 0 && rnd.nextInt(100) < skewPercent) {
      // hot-key path: single literal word (same token stream shape the
      // reference produces for its skew experiments)
      val sb = new StringBuilder(5 * size)
      var i = 0
      while (i < size) { if (i > 0) sb.append(' '); sb.append("skew"); i += 1 }
      sb.toString
    } else {
      val sb = new StringBuilder(8 * size)
      var i = 0
      while (i < size) {
        if (i > 0) sb.append(' ')
        sb.append(dict(rnd.nextInt(dict.length)))
        i += 1
      }
      sb.toString
    }
  }

  /** Sentence for a global record index — deterministic regardless of
    * which executor/partition generates it, so a replayed micro-batch
    * regenerates identical data (exactly-once across recovery). */
  def sentenceAt(index: Long, dict: Array[String], size: Int,
                 skewPercent: Int = 0): String =
    nextSentence(new Random(index * 0x9E3779B97F4A7C15L), dict, size, skewPercent)
}
