package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-regime kill-and-recover measurement (Bench
  * .streamRecovery): the query is stopped mid-run with state in the
  * RocksDB store, restarts from the same checkpoint, and the
  * measurement must report a real recovered throughput and a positive
  * recovery time — not the -1.0 failure sentinel. Exactly-once of the
  * replay itself is MidFlightKillSpec's job; this guards the metric
  * plumbing (named-query event filtering, checkpoint reuse, sentinel
  * paths) at a scale the suite can afford. */
class BenchRecoverySpec extends AnyFunSuite {

  test("kill-and-recover reports recovered throughput and recovery time") {
    val spark = SparkTestSession.spark
    val (wps, recoverySec) = Bench.streamRecovery(
      spark, preKillSec = 3, measureSec = 3, rowsPerBatch = 5000)
    assert(wps > 0, s"recovered words/s sentinel: $wps")
    assert(recoverySec > 0, s"recovery seconds sentinel: $recoverySec")
  }
}
