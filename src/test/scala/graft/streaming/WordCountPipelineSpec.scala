package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class WordCountPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("tokenize matches Java String.split(\"\\\\W+\") semantics incl. edge cases") {
    import spark.implicits._
    // leading delimiter (yields empty first token in Java), apostrophes
    // (fragment under \W+ — FIXTURES.md A), doubled separators, unicode
    val inputs = Seq(
      " leading space", "trailing space ", "a  b\t\tc", "don't stop",
      "semi;colon,comma", "multi\n\nline", "'d 'em &c", "plain words here")
    val sentences = inputs.zipWithIndex
      .map { case (s, i) => Sentence(if (i % 2 == 0) 1000L + i else -1L, s, 0) }
    val got = WordCountPipeline.tokenize(sentences.toDS()).collect()

    val expected = sentences.flatMap { s =>
      s.sentence.split("\\W+").filter(_.nonEmpty)
        .map(w => Token(s.ts, w, 1L, s.sourceId))
    }
    assert(got.sortBy(t => (t.word, t.ts)) === expected.sortBy(t => (t.word, t.ts)))
  }

  test("runningCounts (update-mode analog) equals batch counts after replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Sentence]
    val q = WordCountPipeline.runningCounts(WordCountPipeline.tokenize(ms.toDS()))
      .writeStream.outputMode("complete").format("memory")
      .queryName("wcp_running").start()
    try {
      ms.addData(Sentence(-1, "a b a", 0)); q.processAllAvailable()
      ms.addData(Sentence(-1, "b c", 0), Sentence(-1, "a", 1))
      q.processAllAvailable()
    } finally q.stop()
    val res = spark.table("wcp_running").as[(String, Long)].collect().toMap
    assert(res === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("statefulCounts emits running totals only for stamped records") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Sentence]
    val q = WordCountPipeline.statefulCounts(WordCountPipeline.tokenize(ms.toDS()))
      .writeStream.outputMode("append").format("memory")
      .queryName("wcp_stateful").start()
    try {
      // batch 1: one stamped, one unstamped sentence
      ms.addData(Sentence(100L, "x y x", 7), Sentence(-1L, "x z", 3))
      q.processAllAvailable()
      // batch 2: unstamped only — state advances, nothing emitted
      ms.addData(Sentence(-1L, "x x", 0)); q.processAllAvailable()
      // batch 3: stamped — emitted totals include all prior state
      ms.addData(Sentence(200L, "x", 9)); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("wcp_stateful").as[WordCount].collect()

    // batch 1 emissions: only the stamped sentence's tokens; 'x' appears
    // twice in it → totals 1 then 2 (the unstamped 'x z' contributes to
    // state later in the same batch per arrival order but emits nothing)
    val b1x = out.filter(w => w.ts == 100L && w.word == "x").map(_.count).sorted
    assert(b1x.length === 2)
    assert(out.filter(w => w.ts == 100L && w.word == "y").map(_.count).toSeq === Seq(1L))
    assert(!out.exists(_.word == "z")) // 'z' only ever arrived unstamped
    // batch 3: x total = 3 (b1) + 2 (b2) + 1 = 6, carrying ts/sourceId
    val b3 = out.filter(_.ts == 200L)
    assert(b3.toSeq === Seq(WordCount(200L, "x", 6L, 9)))
  }
}
