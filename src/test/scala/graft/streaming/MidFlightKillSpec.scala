package graft.streaming

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The kill_worker.sh analog at full strength (reference run_job.sh:77-83
  * kills a live TaskManager MID-RUN, not between checkpoints): hard-stop
  * the streaming query while a micro-batch is IN FLIGHT — offsets WAL
  * written, commit log not — restart from the same checkpoint, and prove
  * the running counts come out exactly-once.
  *
  * CheckpointRecoverySpec covers the clean between-batch restart; this
  * spec covers the dirty one: the killed batch must be replayed from the
  * offset log on restart, and its partially-emitted sink output must be
  * superseded, not double-counted. */
class MidFlightKillSpec extends AnyFunSuite {

  test("hard stop during an in-flight batch recovers exactly-once") {
    val spark = SparkTestSession.spark
    import spark.implicits._

    // deterministic corpus staged as 4 files = 4 planned micro-batches
    val staged = Files.createTempDirectory("graft-kill-stage").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    docs.repartition(4).write.mode("overwrite").parquet(staged)

    // kill switch: tasks crawl while the marker exists (≈2s per batch),
    // run at full speed after restart
    val marker: Path = Files.createTempFile("graft-kill-marker", "")
    val markerPath = marker.toString
    val crawl = udf { (s: String) =>
      if (Files.exists(Paths.get(markerPath))) Thread.sleep(15)
      s
    }

    val ckpt = Files.createTempDirectory("graft-kill-ckpt").toString
    // merged last-write-wins totals across update-mode emissions; a
    // replayed batch re-emits identical cumulative values, so the merge
    // converges iff recovery is exactly-once
    val merged = mutable.Map.empty[String, Long]

    def startQuery() = {
      val counts = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .select(explode(split(crawl(col("text")), "\\W+")).as("word"))
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

    // run 1: wait until batch 0 committed AND batch 1's offsets are
    // written (batch 1 in flight — it crawls for ~2s), then hard-stop
    val q1 = startQuery()
    val deadline = System.currentTimeMillis() + 60000
    def exists(p: String) = Files.exists(Paths.get(p))
    while (!(exists(s"$ckpt/commits/0") && exists(s"$ckpt/offsets/1")) &&
           System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(exists(s"$ckpt/offsets/1"), "batch 1 never started")
    Thread.sleep(300) // land inside batch 1's task execution
    q1.stop()
    // the mid-flight signature: a batch is planned but not committed
    assert(!exists(s"$ckpt/commits/3"), "all input processed before kill")
    val plannedUncommitted = (0 to 3).exists(b =>
      exists(s"$ckpt/offsets/$b") && !exists(s"$ckpt/commits/$b"))
    assert(plannedUncommitted,
      "kill landed between batches — no in-flight batch to replay")

    // run 2: full speed, drain everything from the same checkpoint
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
