package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup.ShingleUtil

class DedupKernelSpec extends AnyFunSuite {

  test("tokens replicates split-with-trailing-empties semantics") {
    assert(ShingleUtil.tokens("a b  c").toSeq === Seq("a", "b", "c"))
    assert(ShingleUtil.tokens(" a b").toSeq === Seq("", "a", "b"))
    assert(ShingleUtil.tokens("a b ").toSeq === Seq("a", "b", ""))
  }

  test("shingles are sliding n-grams, distinct, first-occurrence order") {
    val toks = "x y z x y z x".split(" ")
    val sh = ShingleUtil.shingles(toks, 3)
    assert(sh.toSeq === Seq("x y z", "y z x", "z x y"))
  }

  test("minhash signature is deterministic and within [0, 2^31-1)") {
    val a = Array(3L, 5L, 7L); val b = Array(11L, 13L, 17L)
    val hs = Array("x y z", "y z x").map(ShingleUtil.baseHash)
    val s1 = ShingleUtil.signature(hs, a, b)
    val s2 = ShingleUtil.signature(hs, a, b)
    assert(s1.toSeq === s2.toSeq)
    assert(s1.length === 3)
    assert(s1.forall(v => v >= 0 && v < 2147483647L))
  }

  test("near-identical shingle sets collide in at least one band") {
    // simulate a J≈0.97 pair: 64 shared shingles, 2 unique per side
    val shared = (1 to 64).map(i => s"sh$i shared gram")
    val d1 = (shared ++ Seq("only a x", "only a y")).toArray
    val d2 = (shared ++ Seq("only b x", "only b y")).toArray
    val rnd = new scala.util.Random(42)
    val a = Array.fill(64)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(64)(rnd.nextInt(Int.MaxValue).toLong)
    val k1 = ShingleUtil.bandKeys(
      ShingleUtil.signature(d1.map(ShingleUtil.baseHash), a, b), 16, 4)
    val k2 = ShingleUtil.bandKeys(
      ShingleUtil.signature(d2.map(ShingleUtil.baseHash), a, b), 16, 4)
    assert(k1.zip(k2).exists { case (x, y) => x == y },
      "expected at least one shared LSH band for a J≈0.97 pair")
  }
}
