package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[QuerySpec]] in one of the
  * operator modules; this object just flattens the registry into the
  * `queries` / `oracleSql` maps the driver consumes.
  */
object SparkEntry {

  /** Full operator registry (SURVEY.md §2 inventory + pipeline extensions). */
  def allSpecs: Seq[QuerySpec] =
    operators.Relational.specs ++
    operators.TextAnalysis.specs ++
    operators.Dedup.specs ++
    operators.Similarity.specs ++
    operators.StreamingOps.specs ++
    operators.Multimodal.specs ++
    operators.ScaleOps.specs ++
    operators.Pipeline.specs ++
    operators.Graph.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(s => s.oracle.map(sql => s.name -> sql)).toMap
}
