package graft.streaming

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The kill_worker.sh analog at full strength (reference run_job.sh:77-83
  * kills a live TaskManager MID-RUN, not between checkpoints): the query
  * dies while micro-batch 1 is IN FLIGHT — offsets WAL written, commit
  * log not — restarts from the same checkpoint, and the running counts
  * come out exactly-once.
  *
  * The kill is an injected TASK failure, keyed on durable state (batch 0
  * committed + kill marker present), not on wall-clock timing: batch-1
  * tasks throw, the job fails before the commit log is written, and the
  * query terminates with an error — exactly what `kill -9` on the worker
  * produces (its tasks die; the driver's batch fails). A graceful
  * q.stop() is NOT a kill: it can let the in-flight batch run to a
  * completed commit (measured), which reduces this spec to the clean
  * between-batch restart that CheckpointRecoverySpec already covers.
  *
  * The replayed batch's partially-emitted sink output must be superseded
  * on restart, not double-counted: the update-mode foreachBatch merge is
  * last-write-wins per word, so the totals converge iff recovery is
  * exactly-once. */
class MidFlightKillSpec extends AnyFunSuite {

  test("mid-flight batch failure recovers exactly-once from the offset log") {
    val spark = SparkTestSession.spark
    import spark.implicits._

    // deterministic corpus staged as 4 files = 4 planned micro-batches
    val staged = Files.createTempDirectory("graft-kill-stage").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    docs.repartition(4).write.mode("overwrite").parquet(staged)

    val ckpt = Files.createTempDirectory("graft-kill-ckpt").toString

    // the kill switch: batch-0 tasks run free (commits/0 cannot exist
    // until after every batch-0 task has finished), batch-1 tasks see
    // commits/0 + the marker and DIE. No sleeps, no polling races — the
    // failure is a pure function of durable checkpoint state.
    val marker: Path = Files.createTempFile("graft-kill-marker", "")
    val markerPath = marker.toString
    val commits0 = s"$ckpt/commits/0"
    val gate = udf { (s: String) =>
      if (Files.exists(Paths.get(commits0)) &&
          Files.exists(Paths.get(markerPath)))
        throw new RuntimeException("injected mid-flight worker kill")
      s
    }

    // merged last-write-wins totals across update-mode emissions; a
    // replayed batch re-emits identical cumulative values, so the merge
    // converges iff recovery is exactly-once
    val merged = mutable.Map.empty[String, Long]

    def startQuery() = {
      val counts = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .select(explode(split(gate(col("text")), "\\W+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).count()
      counts.writeStream
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(String, Long)].collect()
            .foreach { case (w, c) => merged.synchronized { merged(w) = c } }
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(50))
        .start()
    }

    // run 1: batch 0 commits, batch 1 is planned (offsets/1 written) and
    // its tasks are killed — the query must terminate with the failure
    val q1 = startQuery()
    val died =
      try { q1.awaitTermination(120000); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
    assert(died, "query survived the injected mid-batch kill")
    def exists(p: String) = Files.exists(Paths.get(p))
    // the mid-flight signature: batch 1 planned but not committed
    assert(exists(s"$ckpt/commits/0"), "batch 0 never committed")
    assert(exists(s"$ckpt/offsets/1"), "batch 1 was never planned")
    assert(!exists(s"$ckpt/commits/1"), "killed batch must not commit")

    // run 2: kill switch off, drain everything from the same checkpoint
    Files.deleteIfExists(marker)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    // offline ground truth over the staged corpus
    val expected = docs
      .select(explode(split(col("text"), "\\W+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).count()
      .as[(String, Long)].collect().toMap
    assert(merged.toMap === expected)
  }
}
