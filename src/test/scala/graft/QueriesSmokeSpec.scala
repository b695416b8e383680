package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered operator must at least execute end-to-end on the
  * smoke scale factor (the exact-value gate is graft.Verify + the
  * driver's DuckDB compare; see .claude/skills/verify/SKILL.md). */
class QueriesSmokeSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a unique name and runs at sf0.001") {
    val names = SparkEntry.allSpecs.map(_.name)
    assert(names.distinct.size === names.size)
    SparkEntry.allSpecs.foreach { spec =>
      val n = spec.fn(spark, sfDir).count()
      withClue(spec.name) { assert(n >= 0) }
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }
}
