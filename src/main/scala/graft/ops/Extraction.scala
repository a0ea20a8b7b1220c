package graft.ops

import java.sql.Date

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.QueryDefinition

/** The extraction "compiler" (reference S2+S3: _build_query +
  * _row_to_dict, pipeline.py:92-107): a QueryDefinition becomes a
  * declarative DataFrame program — projection of the declared fields
  * (nested paths flattened to snake_case) + the inclusive date-range
  * predicate on the declared date column.
  *
  * Where the reference renders a GAQL string and ships it to Google's
  * servers, here the "server" is any DataFrame source and Catalyst does
  * the shipping: the predicate and projection push down into the scan
  * (PushedFilters / ReadSchema), which is the same optimization the
  * reference gets by embedding them in GAQL — except applied to any
  * source, automatically.
  */
object Extraction {

  /** S2/S3: compile a query definition against a source frame. Nested
    * field paths (`a.b.c`) resolve into struct columns and flatten to
    * `a_b_c`; the date predicate is BETWEEN-inclusive (F1,
    * pipeline.py:96). `__query_name` is injected per the payload
    * contract (raw_sink_contract.md:30).
    */
  def compile(source: DataFrame, q: QueryDefinition, start: Date, end: Date): DataFrame = {
    val projected: Seq[Column] =
      q.fields.map(f => col(f).as(QueryDefinition.snakeCase(f))) :+
        lit(q.name).as("__query_name")
    source
      .where(col(q.dateColumn).between(lit(start), lit(end)))
      .select(projected: _*)
  }

  /** The daily incremental window (pipeline.py:164-178): re-extract
    * [target - lookback, target] so late-arriving source mutations
    * within the lookback horizon are superseded by the newer run.
    */
  def dailyWindow(target: Date, lookbackDays: Int): (Date, Date) = {
    val start = Date.valueOf(target.toLocalDate.minusDays(lookbackDays.toLong))
    (start, target)
  }

  /** S1 through the DataSource V2 connector
    * ([[graft.sources.JsonlPartitionSource]]): open the reference-layout
    * JSONL sink as a DataFrame. Filters on the partition-key columns
    * applied downstream (e.g. by [[compileSink]]) push into the scan
    * and prune whole directories.
    */
  def readSink(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    spark.read
      .format(classOf[graft.sources.JsonlPartitionSource].getName)
      .option("path", root)
      .load()

  /** [[compile]]'s counterpart over the sink connector, where payload
    * fields are already flattened snake_case (raw_sink_contract.md:30)
    * and the date window binds to the `logical_date` partition column —
    * so the BETWEEN prunes directories rather than rows.
    */
  def compileSink(sink: DataFrame, q: QueryDefinition, start: Date, end: Date): DataFrame = {
    val projected: Seq[Column] =
      q.fields.map(f => col(QueryDefinition.snakeCase(f))) :+ col("__query_name")
    sink
      .where(col("logical_date").between(lit(start), lit(end)))
      .where(col("query_name") === q.name) // partition column ⇒ directory pruning
      .select(projected: _*)
  }
}
