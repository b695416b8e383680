package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stdout-tail contract that finally made the driver's bench
  * parser succeed in round 4: the LAST line Bench prints must be pure
  * JSON and fit comfortably inside the parser's bounded (~2000-char)
  * tail window, for the REAL registered query-name set — so adding
  * queries can never silently push the artifact back to `parsed: null`.
  * Also pins the prefix-fallback dedup (duplicate JSON keys would drop
  * a timing). */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  // THE builder main() uses, fed worst realistic widths (8-digit
  // words/s, 4-digit latencies) — so a field added to extrasJson is
  // automatically under this spec's length budget
  private val extras = Bench.extrasJson(
    streamWps = 13606060d, streamWpsRocks = 11008300d,
    streamWpsSkew = 13606060d, streamWpsRecovery = 11008300d,
    recoverySec = 12.34,
    lat = Bench.LatencyStats(p50 = 1509.0, p95 = 1223.0,
      meanBatchMs = 1234.0, backlogBatches = 123L),
    streamWpsSpread = 0.87, streamWpsRocksSpread = 0.87)

  test("last line fits the driver's tail window for all registered queries") {
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 1234.56789)
    val (full, last) = Bench.buildLines(results, extras, "/root/testdata/sf0.1")
    assert(last.length <= 1800, s"compact line ${last.length} chars")
    val node = mapper.readTree(last)
    assert(node.get("metric").asText() === "total")
    assert(node.get("queries").size() === results.size,
      "a timing was lost to a duplicate key")
    assert(node.get("stream_words_per_sec_recovery").asLong() === 11008300L)
    assert(mapper.readTree(full).get("queries").size() === results.size)
  }

  test("prefix fallback disambiguates shared prefixes") {
    // enough 30-char names to blow the 1800 budget and force the
    // prefix fallback, with three sharing the "q23" prefix
    val names = Seq("q23_alpha_variant", "q23_beta_variant", "q23_gamma") ++
      (1 to 90).map(i => f"zz$i%03d_some_quite_long_query_name")
    val results = names.map(_ -> 9.87)
    val (_, last) = Bench.buildLines(results, extras, "/sf")
    assert(last.length <= 1800)
    val qs = mapper.readTree(last).get("queries")
    assert(qs.size() === results.size, "duplicate prefix dropped a timing")
    assert(qs.has("q23") && qs.has("q23-2") && qs.has("q23-3"))
  }
}
