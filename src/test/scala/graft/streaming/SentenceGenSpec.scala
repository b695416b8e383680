package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class SentenceGenSpec extends AnyFunSuite {

  private val dict = SentenceGen.dictionary(dictSize = 1000, seed = 42L)

  test("dictionary is deterministic and correctly sized") {
    val again = SentenceGen.dictionary(dictSize = 1000, seed = 42L)
    assert(dict.sameElements(again))
    assert(dict.length === 1000)
    assert(dict.forall(w => w.length >= 2 && w.length <= 12))
    assert(dict.forall(_.forall(c => (c >= 'a' && c <= 'z') || c == '\'')))
  }

  test("dictionary ships apostrophe tokens and they tokenize like the oracle") {
    val big = SentenceGen.dictionary(dictSize = 5000, seed = 42L)
    val apos = big.filter(_.contains("'"))
    // ~3% of entries must exercise the apostrophe path, incl. bare elisions
    assert(apos.length > big.length / 100, s"only ${apos.length} apostrophe tokens")
    assert(apos.exists(_.startsWith("'")), "no bare-elision ('d / 'em) tokens")
    // reference tokenizer semantics (split \W+, drop empties) on every
    // apostrophe word: clean alphabetic sub-tokens, no empty leakage —
    // the leading-empty-split edge a words.txt-faithful dictionary hits
    apos.foreach { w =>
      val parts = w.split("\\W+").filter(_.nonEmpty)
      assert(parts.nonEmpty && parts.forall(_.forall(c => c >= 'a' && c <= 'z')),
        s"token '$w' split to ${parts.mkString("[", ",", "]")}")
    }
  }

  test("default-size dictionary is the reference's literal words.txt") {
    val real = SentenceGen.dictionary() // default size → resource-backed
    assert(real.length === SentenceGen.DefaultDictSize)
    assert(real eq SentenceGen.realDictionary)
    // reference words.txt fingerprints: first/known entries and the
    // apostrophe-token census (RandomSentenceGenerator.java:23-31 loads
    // this file verbatim; we ship the same bytes as a resource)
    assert(real.head === "&c")
    assert(real.take(6).toSeq === Seq("&c", "'d", "'em", "'ll", "'m", "'mid"))
    assert(real.count(_.contains("'")) === 3869)
    // every entry tokenizes cleanly under the reference tokenizer
    // (split \W+, drop empties) — incl. the empty line and '&c'
    real.foreach { w =>
      val parts = w.split("\\W+").filter(_.nonEmpty)
      assert(parts.forall(p => p.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))),
        s"entry '$w' split to ${parts.mkString("[", ",", "]")}")
    }
  }

  test("sentenceAt is deterministic per index and varies across indices") {
    val s1 = SentenceGen.sentenceAt(17L, dict, size = 10)
    val s2 = SentenceGen.sentenceAt(17L, dict, size = 10)
    val s3 = SentenceGen.sentenceAt(18L, dict, size = 10)
    assert(s1 === s2)
    assert(s1 !== s3)
    assert(s1.split(" ").length === 10)
  }

  test("skew knob emits the hot-key sentence at ~skewPercent rate") {
    val n = 10000
    val skewed = (0 until n).count { i =>
      SentenceGen.sentenceAt(i.toLong, dict, size = 5, skewPercent = 30)
        .startsWith("skew")
    }
    // ~30% ± generous tolerance (deterministic given the seed scheme)
    assert(skewed > n * 25 / 100 && skewed < n * 35 / 100,
      s"skewed=$skewed of $n")
  }

  test("skewPercent=0 never emits the hot key") {
    assert((0 until 2000).forall { i =>
      !SentenceGen.sentenceAt(i.toLong, dict, size = 5).startsWith("skew ")
    })
  }
}
