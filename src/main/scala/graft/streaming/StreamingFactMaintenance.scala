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
  * The cross-batch authority is ARRIVAL ORDER — a batch's grains
  * REPLACE the stored grains outright, by grain membership, never by
  * comparing run-id strings. (An earlier draft arbitrated via
  * `max(run_id)` over zero-padded batch ids; that silently discards
  * new data after a stream restart with a fresh checkpoint — batch ids
  * reset to 0 and sort below every stored id — and lets two streams
  * sharing a prefix disown each other's rows. Grain membership has
  * neither failure mode: the stream's later word is authoritative
  * because it IS later, not because its name sorts higher.)
  *
  * Mechanics per batch:
  *
  *  1. the batch folds through `campaignDaily` alone — intra-batch
  *     split rows sum, and the grain's `last_run_id` records this
  *     batch's zero-padded id (provenance, not authority);
  *  2. stored rows of the TOUCHED dates are kept only where their
  *     grain does NOT appear in the batch (anti-join on the PK);
  *  3. `replaceDatePartitions` rewrites ONLY the touched dates with
  *     kept ∪ batch grains.
  *
  * Replay (the foreachBatch crash contract) is idempotent by
  * construction: the batch's grains are rebuilt from the batch alone,
  * and kept rows don't depend on who wrote them. A crash between
  * partition replaces self-heals the same way.
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
    if (batch.isEmpty) return
    val payload = batch
      .select(
        col("customer_id"), col("campaign_id"), col("date"),
        col("impressions"), col("clicks"), col("conversions"), col("cost_micros"))
      .withColumn("run_id", lit(f"${runPrefix}_$batchId%012d"))
    val batchFact = FactTables.campaignDaily(payload)
    if (!spark.catalog.tableExists(tableName)) {
      FactTables.registerPartitioned(batchFact, tableName, Some(path))
      return
    }
    val touched = payload.select("date").distinct()
    val kept = spark.table(tableName)
      .join(touched, Seq("date"), "left_semi") // partition-pruned slice
      .join(batchFact.select(FactTables.CampaignGrain.map(col): _*),
        FactTables.CampaignGrain, "left_anti") // batch grains replace stored outright
    FactTables.replaceDatePartitions(spark, tableName, kept.unionByName(batchFact))
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
