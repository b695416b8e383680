package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** End-to-end demo of the skew story the reference's knob exists for
  * (RandomSentenceGenerator.java:47-53: with probability skewPercent%
  * the generator emits the all-"skew" sentence, melting one reducer in
  * a keyed aggregation): the skewed stream flows through the engine's
  * stateful streaming count, and x01's salted two-phase aggregation
  * over the same corpus produces identical totals to the direct
  * groupBy — the hot key spreads over SALT sub-keys in phase 1 instead
  * of landing on one reducer, with provably unchanged results. */
class SkewDemoSpec extends AnyFunSuite {

  private val SALT = 16

  test("skewed stream: stateful count ≡ direct batch ≡ salted two-phase") {
    val spark = SparkTestSession.spark
    import spark.implicits._

    // deterministic skewed corpus from the engine's own generator:
    // 30% hot all-"skew" sentences, the rest dictionary draws
    val dict = SentenceGen.dictionary(dictSize = 1000)
    val sentences = (0L until 400L).map(i =>
      Sentence(ts = -1L, sentence =
        SentenceGen.sentenceAt(i, dict, size = 20, skewPercent = 30),
        sourceId = (i % 4).toInt))
    val df = sentences.toDF()

    // skew is actually present: the hot key dominates every other word
    val tokens = df
      .select(explode(split(col("sentence"), "\\W+")).as("word"))
      .where(length(col("word")) > 0)
    val direct = tokens.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val byCnt = direct.orderBy(col("cnt").desc).as[(String, Long)].collect()
    assert(byCnt.head._1 === "skew", s"hot key not dominant: ${byCnt.head}")
    assert(byCnt.head._2 > 5 * byCnt(1)._2,
      s"skew knob produced no real skew: ${byCnt.take(2).mkString(",")}")

    // x01's salted two-phase over the same tokens: identical totals
    val salted = tokens
      .withColumn("salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(SALT)))
      .groupBy(col("word"), col("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("word"))
      .agg(sum(col("partial")).as("cnt"))
    assert(salted.as[(String, Long)].collect().toMap ===
      direct.as[(String, Long)].collect().toMap)

    // the streaming stateful count over the same skewed corpus, replayed
    // in two micro-batches, converges to the same totals
    val staged = java.nio.file.Files.createTempDirectory("graft-skew").toString
    df.repartition(2).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged).as[Sentence]
    val counts = WordCountPipeline.runningCounts(
      WordCountPipeline.tokenize(stream))
    val qname = "skewdemo_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName(qname).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(qname)
      .select(col("word"), col("count")).as[(String, Long)].collect().toMap
    assert(streamed === direct.as[(String, Long)].collect().toMap)
    spark.sql(s"DROP TABLE IF EXISTS $qname")
  }
}
