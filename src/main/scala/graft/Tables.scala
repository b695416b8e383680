package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * One parquet per table under `sfDir`. All engine queries read through
  * here so scans stay declarative — Catalyst pushes filters/projections
  * into the parquet reader (verified via `.explain`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped with two `ts` layouts across driver
    * generations: `timestamp[ns]` (which Spark's parquet reader rejects —
    * [PARQUET_TYPE_ILLEGAL]; the legacy conf surfaces the physical int64
    * nanos, floor-divided to micros here) and plain `timestamp[us]`
    * (readable directly). Branch on the decoded type so both work; either
    * way the surfaced column is TIMESTAMP_NTZ at µs precision — the same
    * wall-clock values DuckDB produces. Integer `div` (not `/`) for the ns
    * path: 2024 epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact range.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = load(s, d, "events")
    val tsCol = raw.schema("ts").dataType match {
      case LongType        => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts")
      // fail LOUD on anything else — in particular session-timezone
      // TimestampType (isAdjustedToUTC=true parquet): casting that to
      // NTZ converts through the session zone, which would silently
      // shift every wall-clock in a session not pinned to UTC
      case other => throw new IllegalStateException(
        s"events.ts decoded as $other — expected int64 nanos or " +
          "timestamp_ntz; teach Tables.events this layout explicitly")
    }
    raw.withColumn("ts", tsCol.cast(TimestampNTZType))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Cached table row count, for plan-SIZING knobs only (LSH plane
    * count, IVF centroid count, TF-IDF corpus size): parquet footer
    * counts are metadata-cheap but still a Spark job each, and the
    * sizing ops re-derive them on every invocation — in one bench JVM
    * that was a measurable constant cost per query (round-5 verdict:
    * s02 outlier item). The fixture dirs are immutable within a JVM
    * run (driver testdata; ScaleProbe writes each amplified dir once,
    * before its first query), so the count is keyed by path and
    * computed once. NOT for query results — only for knob derivation,
    * where a stale count would mildly mis-size a bucket, not corrupt
    * an answer. */
  private val rowCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def cachedCount(s: SparkSession, d: String, name: String): Long =
    rowCounts.computeIfAbsent(s"$d/$name",
      _ => load(s, d, name).count())
}

/** One engine operator exposed through the driver contract.
  *
  * @param name   stable query id (drives `SparkEntry.queries` keys)
  * @param fn     the Spark-side implementation
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables;
  *               None for ops that are not SQL-expressible (driver then
  *               records a weaker rows-only check)
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
