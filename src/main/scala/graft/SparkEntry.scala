package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All query definitions live in graft.ops / graft.llm; this object is
  * the stable façade the driver harness calls.
  */
object SparkEntry {

  /** Flagship query (q04 fact rollup, SURVEY.md §2.3) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.RelationalQueries.q04.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] = ops.Registry.oracleSql
}
