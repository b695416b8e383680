package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** d07's min-label-propagation connected components (the cluster step
  * that turns pairwise near-dup edges into keep-one-per-cluster). */
class ClusterResolutionSpec extends AnyFunSuite {

  private def cc(pairs: Seq[(Long, Long)], maxIters: Int = 25) = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("id1", "id2"), maxIters)
      .as[(Long, Long)].collect().toMap
  }

  test("a multi-hop chain converges to the component minimum") {
    // path 1-2-3-4-5 has diameter 4: the min label needs several
    // propagation rounds to reach node 5 — exercises the loop, not just
    // the base case. 10-11 is a disjoint second component.
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
                          10L -> 10L, 11L -> 10L))
  }

  test("edge direction does not matter") {
    // min id on the RIGHT side of its pairs must still win the component
    val labels = cc(Seq((5L, 1L), (5L, 9L), (9L, 3L)))
    assert(labels === Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("no pairs yields no labeled nodes") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("a long duplicate chain converges in O(log d) rounds, not O(d)") {
    // 64-hop path: plain min-label propagation needs ~one round per hop
    // (round 5's loop could never resolve this inside maxIters = 25);
    // the pointer-jumping shortcut must land it in ~log2(64)+verify
    // rounds. maxIters = 12 would fail the old algorithm loudly.
    val n = 64L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val labels = cc(chain, maxIters = 12)
    assert(labels.size === n)
    assert(labels.values.forall(_ == 0L))
  }

  test("non-convergence within maxIters fails loudly, never silently") {
    // even with the shortcut, a 64-hop chain cannot resolve in 2 rounds
    val chain = (0L until 63L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      cc(chain, maxIters = 2)
    }
    assert(ex.getMessage.contains("converge"))
  }
}
