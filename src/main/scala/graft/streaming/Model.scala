package graft.streaming

/** Record shapes of the streaming word-count pipeline, mirroring the
  * reference's tuple types (SURVEY.md §1.1):
  *  - Sentence  ≙ Tuple3<Long,String,Integer>  (RateControlledSourceFunction.java:12)
  *  - Token     ≙ Tuple4<Long,String,Long,Integer> tokenizer output
  *    (StatefulWordCount.java:104,122)
  *  - WordCount ≙ Tuple4<Long,String,Long,Integer> running-count output
  *    (StatefulWordCount.java:134,163)
  *
  * `ts` is the sampled-latency channel: -1 for unstamped records; every
  * samplePeriod-th record carries its scheduled emission time in epoch ms
  * (SURVEY.md §1.3). */
final case class Sentence(ts: Long, sentence: String, sourceId: Int)
final case class Token(ts: Long, word: String, cnt: Long, sourceId: Int)
final case class WordCount(ts: Long, word: String, count: Long, sourceId: Int)
