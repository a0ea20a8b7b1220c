package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (q27; streaming twin in graft.streaming):
  * gap-rule sessions via lag + running sum — the classic
  * windows-over-ordered-events formulation. One shuffle per user
  * partition; both window frames share the same (user_id, ts, id) sort
  * so Spark evaluates them in a single Window exec pass each.
  */
object Sessionize {

  /** Assign session ids and aggregate: events must carry
    * (user_id, event_id, ts_us). A gap > `gapUs` opens a new session.
    * Output: (user_id, session_id, n_events, start_us, end_us).
    */
  def sessions(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn(
        "is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L),
      )
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
      )
  }
}
