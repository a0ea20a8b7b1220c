package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Test-table catalog. One parquet file per table under an sf directory
  * (see repo:TESTDATA.md). All readers go through here so scan options
  * stay uniform (schema from parquet footer, vectorized reads, partition
  * discovery untouched).
  *
  * At cluster scale the same call works against a directory of many
  * part-files or a hive-partitioned layout: `spark.read.parquet(dir)`
  * performs partition discovery and Catalyst pushes filters/pruning into
  * the scan — nothing here hard-codes single-file assumptions.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The events table's `ts` has shifted annotation across testdata
    * generations, and this reader absorbs both:
    *  - TIMESTAMP(NANOS): no native Spark type (PARQUET_TYPE_ILLEGAL) —
    *    read nanos as long (legacy conf) and truncate to µs, the same
    *    truncation DuckDB's `epoch_us` applies;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ and stays NTZ, matching DuckDB's naive TIMESTAMP
    *    read of the same file — so timestamp-typed outputs compare
    *    equal. Epoch arithmetic sites cast NTZ→LTZ first (identity on
    *    the wall-clock under the pinned UTC session) because unix_*
    *    functions reject NTZ input.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One verifiable query: a DataFrame program plus (when SQL-expressible)
  * the DuckDB oracle the driver hash-matches it against. Column names and
  * types must agree between the two (repo:SURVEY.md §7.0 determinism
  * rules: total ORDER BY, exact decimal math under money sums cast back
  * to double, fixed date anchors, epoch integers instead of raw
  * timestamps).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
