package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pipeline composition invariants beyond the DuckDB gate: p03's
  * epoch-repetition semantics (the mixing contract a training run
  * depends on). */
class PipelineSpec extends AnyFunSuite {

  private val sfDir = SparkTestSession.sfDir
  private lazy val spark = SparkTestSession.spark

  private lazy val mix =
    graft.SparkEntry.queries("p03_domain_mixing")(spark, sfDir).cache()

  test("p03 emits exactly n_copies rows per doc, epochs 1..n_copies") {
    val bad = mix.groupBy(col("doc_id"), col("n_copies"))
      .agg(count(lit(1)).as("rows"),
           min(col("epoch")).as("lo"), max(col("epoch")).as("hi"))
      .where(col("rows") =!= col("n_copies") ||
             col("lo") =!= 1L || col("hi") =!= col("n_copies"))
    assert(bad.isEmpty, "every doc must expand to a dense 1..n_copies")
  }

  test("p03 copy counts honor the per-class weight contract") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
    val perDoc = docs.join(mix.select(col("doc_id"), col("n_copies"))
      .distinct(), Seq("doc_id"), "left")
      .select(col("source"), coalesce(col("n_copies"), lit(0L)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val curated = Set("src0", "src1", "src2", "src3")
    val mid = Set("src4", "src5", "src6", "src7", "src8", "src9")
    perDoc.foreach { case (src, n) =>
      if (curated(src)) assert(n == 2L || n == 3L, s"$src: $n")
      else if (mid(src)) assert(n == 1L, s"$src: $n")
      else assert(n == 0L || n == 1L, s"$src: $n")
    }
    // fractional coins must land near their rates (hash uniformity):
    // curated mean ∈ [2, 3] clearly off 2.5 only on a broken hash
    val cMean = perDoc.collect { case (s, n) if curated(s) => n.toDouble }
    val tKeep = perDoc.collect {
      case (s, n) if !curated(s) && !mid(s) => n.toDouble }
    assert(math.abs(cMean.sum / cMean.size - 2.5) < 0.25,
      s"curated mean epochs ${cMean.sum / cMean.size} drifted from 2.5")
    assert(math.abs(tKeep.sum / tKeep.size - 0.25) < 0.15,
      s"tail keep rate ${tKeep.sum / tKeep.size} drifted from 0.25")
  }

  test("p03 is deterministic: a re-run selects the identical mix") {
    val again = graft.SparkEntry.queries("p03_domain_mixing")(spark, sfDir)
    assert(again.exceptAll(mix).isEmpty && mix.exceptAll(again).isEmpty)
  }
}
