package graft.tools

import graft.ops.Pin.PinOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.PartitionKey

/** Presentation layer for ledger inspection and consumer previews —
  * the Spark counterpart of the reference's formatters
  * (state_inspect.py:12-61 `format_states`,
  * consumer_preview.py:55-102 `render_preview`): plain fixed-width
  * tables for humans, JSON for machines.
  *
  * Formatting is inherently a driver-side act over a small,
  * already-reduced frame; `limit` bounds the rows pulled (inspection of
  * a million-partition ledger goes through the observe aggregations,
  * not a row dump).
  */
object Inspect {

  /** Render ledger rows (state_inspect.py:12-61). `format` is "table"
    * (plain aligned columns, the reference's tablefmt="plain") or
    * "json".
    */
  def formatStates(states: DataFrame, format: String = "table", limit: Int = 1000): String = {
    // One collect per call: the limit() subset of an unordered frame is
    // not deterministic across evaluations, so the emptiness check and
    // the rendered rows must come from the SAME job.
    if (format == "json") {
      val rows = states.limit(limit).toJSON.collect()
      if (rows.isEmpty) "No partition state records found."
      else rows.mkString("[", ",", "]")
    } else {
      val cols = Seq("source", "customer_id", "query_name", "logical_date",
        "status", "current_run_id", "record_count", "updated_at")
      val rows = states
        .select(
          col("source"), col("customer_id"), col("query_name"),
          col("logical_date").cast("string"),
          col("status"),
          coalesce(col("current_run_id"), lit("-")),
          col("record_count").cast("string"),
          date_format(col("updated_at"), "yyyy-MM-dd'T'HH:mm:ss").as("updated_at"),
        )
        .limit(limit)
        .collect()
      if (rows.isEmpty) "No partition state records found."
      else plainTable(cols, rows)
    }
  }

  /** Render a consumer preview (consumer_preview.py:55-102): a summary
    * table of (key, run_id, sampled row count) followed by per-partition
    * JSON samples of the payload columns.
    */
  def renderPreview(preview: DataFrame, format: String = "table", limit: Int = 1000): String = {
    val keyCols = PartitionKey.columns :+ "run_id"
    // limit() on an unordered frame is nondeterministic across
    // evaluations: materialize the bounded subset ONCE so the summary
    // counts and the rendered samples below describe the same rows.
    val bounded = preview.limit(limit).pinLineage()
    val summaryDf = bounded
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("sample_rows"))
      .orderBy(keyCols.map(col): _*)
    if (format == "json") {
      val rows = summaryDf.toJSON.collect()
      return if (rows.isEmpty) "No authoritative partitions found."
      else rows.mkString("[", ",", "]")
    }
    val summary = summaryDf
      .select(
        col("source"), col("customer_id"), col("query_name"),
        col("logical_date").cast("string"), col("run_id"),
        col("sample_rows").cast("string"),
      )
      .collect()
    if (summary.isEmpty) "No authoritative partitions found."
    else {
      val head = plainTable(
        Seq("source", "customer_id", "query_name", "logical_date", "run_id", "sample_rows"),
        summary)
      val payloadCols = bounded.columns.filterNot(keyCols.contains)
      val samples = bounded
        .orderBy((keyCols ++ payloadCols.take(1)).map(col): _*)
        .select(
          concat_ws(" ", col("query_name"), col("logical_date").cast("string")).as("k"),
          to_json(struct(payloadCols.map(col): _*)).as("j"),
        )
        .collect()
        .groupBy(_.getString(0)).toSeq.sortBy(_._1)
        .map { case (k, rs) => s"$k sample:\n" + rs.map("  " + _.getString(1)).mkString("\n") }
        .mkString("\n\n")
      s"$head\n\n$samples"
    }
  }

  private def plainTable(headers: Seq[String], rows: Array[Row]): String = {
    val cells: Seq[Seq[String]] =
      headers +: rows.toSeq.map(r => (0 until r.length).map(i => Option(r.getString(i)).getOrElse("-")))
    val widths = headers.indices.map(i => cells.map(_(i).length).max)
    cells
      .map(row => row.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("  ").stripTrailing())
      .mkString("\n")
  }
}
