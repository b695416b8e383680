package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class SentenceGenSpec extends AnyFunSuite {

  private val dict = SentenceGen.dictionary(dictSize = 1000, seed = 42L)

  test("dictionary is deterministic and correctly sized") {
    val again = SentenceGen.dictionary(dictSize = 1000, seed = 42L)
    assert(dict.sameElements(again))
    assert(dict.length === 1000)
    assert(dict.forall(w => w.length >= 3 && w.length <= 9))
    assert(dict.forall(_.forall(c => c >= 'a' && c <= 'z')))
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
