package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.warehouse.FactTables

/** Streaming maintenance of the date-partitioned catalog fact
  * ([[FactTables]]): each micro-batch of raw campaign-daily payload
  * rows folds into the served table under the SAME newest-run-wins
  * authority the batch path applies — the streaming twin of
  * `campaignDaily` + `replaceDatePartitions`, completing the "streams
  * are the same semantics" rule for the warehouse serve surface.
  *
  * Mechanics per batch (its own run, `run_id` = zero-padded batch id —
  * lexicographic ≡ arrival order, the T5 rule):
  *
  *  1. stored grain rows of the TOUCHED dates re-enter the fold as
  *     pseudo-payload under their recorded `last_run_id` (each grain
  *     row is attributable to exactly ONE run — the grain's max);
  *  2. rows whose `last_run_id` IS this batch's run are DROPPED first:
  *     they are a replayed attempt's own output, and the replay
  *     carries the full batch again (idempotent re-fold — the
  *     foreachBatch replay contract);
  *  3. `campaignDaily` re-runs the authority + grain aggregation over
  *     pseudo + batch rows (a single-row pseudo payload reproduces
  *     itself exactly: sums of one row are identities);
  *  4. `replaceDatePartitions` rewrites ONLY the touched dates.
  *
  * Crash between partition replaces is self-healing: a half-applied
  * batch's rows are recognized by `last_run_id` on replay and rebuilt
  * from scratch, untouched runs re-enter as pseudo-payload unchanged.
  *
  * Scale: per batch, work is ∝ batch rows + stored rows of the touched
  * dates (partition-pruned read), never the whole fact; the write
  * touches only those date partitions (one file per date, the
  * [[FactTables.registerPartitioned]] rule).
  */
object StreamingFactMaintenance {

  /** The per-batch fold (exposed for testing replay semantics
    * directly). `batch` carries raw payload columns (customer_id,
    * campaign_id, date, impressions, clicks, conversions, cost_micros);
    * run_id is assigned here. Creates the table on first batch.
    */
  def maintainBatch(tableName: String, path: String, runPrefix: String = "stream")(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.take(1).isEmpty) return
    val runId = f"${runPrefix}_$batchId%012d"
    val payload = batch
      .select(
        col("customer_id"), col("campaign_id"), col("date"),
        col("impressions"), col("clicks"), col("conversions"), col("cost_micros"))
      .withColumn("run_id", lit(runId))
    if (!spark.catalog.tableExists(tableName)) {
      FactTables.registerPartitioned(
        FactTables.campaignDaily(payload), tableName, Some(path))
      return
    }
    val touched = payload.select("date").distinct()
    val pseudo = spark.table(tableName)
      .join(touched, Seq("date"), "left_semi") // partition-pruned slice
      .where(col("last_run_id") =!= runId) // disown a replayed attempt's own output
      .select(
        col("customer_id"), col("campaign_id"), col("date"),
        col("impressions"), col("clicks"), col("conversions"), col("cost_micros"),
        col("last_run_id").as("run_id"))
    val merged = FactTables.campaignDaily(pseudo.unionByName(payload))
    FactTables.replaceDatePartitions(spark, tableName, merged)
  }

  /** Attach the maintainer to a streaming payload frame; caller picks
    * trigger / checkpoint options and calls `.start()`.
    */
  def toCatalogFact(
      stream: DataFrame,
      tableName: String,
      path: String,
      runPrefix: String = "stream",
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(maintainBatch(tableName, path, runPrefix) _)
}
