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

  test("non-convergence within maxIters fails loudly, never silently") {
    val ex = intercept[IllegalStateException] {
      cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), maxIters = 2)
    }
    assert(ex.getMessage.contains("converge"))
  }
}
