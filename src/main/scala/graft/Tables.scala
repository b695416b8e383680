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
  /** events.parquet carries `timestamp[ns]`, which Spark's parquet reader
    * rejects ([PARQUET_TYPE_ILLEGAL] INT64 (TIMESTAMP(NANOS,false))). Read
    * the physical int64 nanos via the legacy conf, then floor-divide to
    * micros and surface a TIMESTAMP_NTZ `ts` — the same wall-clock values
    * DuckDB produces when it truncates ns→µs. Integer `div` (not `/`):
    * 2024 epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact-integer range.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000"))
        .cast(org.apache.spark.sql.types.TimestampNTZType))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
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
