package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{PartitionKey, PartitionState}

/** Warehouse reconcile + publish (reference: warehouse/loader.py:33-132;
  * semantics docs/warehouse_semantics.md).
  *
  * The reference walks success-states one by one and probes a pointer
  * dict; here the whole reconciliation is ONE full-outer join on the
  * 4-part key — the set-based form that runs in a single shuffle
  * regardless of ledger size.
  */
object Warehouse {

  /** Classification of one logical partition after reconcile (the
    * reference's ReconciliationPlan, warehouse/loader.py:23-29).
    */
  object Action {
    val Load = "load" // success state, no pointer (J1)
    val Replace = "replace" // success state, pointer at older run (J1)
    val Noop = "noop" // pointer already current
    val Demote = "demote" // pointer exists, no success state (J2)
  }

  /** J1+J2: full reconcile in one full-outer join. `states` is a ledger
    * snapshot; `pointers` the pointer table. Returns one row per key
    * with `action` + both run ids.
    */
  def reconcile(states: DataFrame, pointers: DataFrame): DataFrame = {
    val s = states
      .where(col("status") === PartitionState.Success && col("current_run_id").isNotNull)
      .select(
        PartitionKey.columns.map(col) :+
          col("current_run_id").as("state_run_id") :+
          col("schema_version").as("state_schema_version"): _*
      )
    val p = pointers.select(
      PartitionKey.columns.map(col) :+
        col("run_id").as("pointer_run_id"): _*
    )
    s.join(p, PartitionKey.columns, "full_outer")
      .withColumn(
        "action",
        when(col("state_run_id").isNotNull && col("pointer_run_id").isNull, Action.Load)
          .when(col("state_run_id").isNull, Action.Demote)
          .when(col("state_run_id") =!= col("pointer_run_id"), Action.Replace)
          .otherwise(Action.Noop),
      )
  }

  /** D3: replace-by-partition publish. Copies the authoritative rows of
    * every load/replace partition from the raw sink into the curated
    * table, atomically replacing exactly the touched logical partitions
    * (dynamic partition overwrite — Spark's native
    * INSERT OVERWRITE ... PARTITION semantics). Never mixes run_ids
    * within a partition (warehouse_semantics.md:17-30).
    */
  def publish(
      spark: SparkSession,
      plan: DataFrame,
      rawRows: DataFrame, // carries key columns + run_id + payload
      curatedRoot: String,
  ): Unit = {
    val targets = plan
      .where(col("action").isin(Action.Load, Action.Replace))
      .select(PartitionKey.columns.map(col) :+ col("state_run_id").as("run_id"): _*)
    // No broadcast hint: an initial load's target set is the whole
    // ledger (millions of rows at scale) — let Spark/AQE pick; the
    // 5-column semi join is cheap either way.
    val toWrite = rawRows.join(targets, PartitionKey.columns :+ "run_id", "left_semi")
    // Per-write option, not a session-conf flip: a concurrent publisher
    // on the same session could otherwise plan its write in the restore
    // window under STATIC overwrite and erase untouched partitions.
    toWrite.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(PartitionKey.columns: _*)
      .mode("overwrite") // dynamic: only partitions present in toWrite are replaced
      .parquet(curatedRoot)
  }

  /** Pointer-table update for a reconcile plan: load/replace upsert the
    * state run_id (loaded_at = `loadedAt`), demote deletes the pointer
    * (D4) — expressed as a pure next-snapshot computation.
    */
  def nextPointers(
      pointers: DataFrame,
      plan: DataFrame,
      loadedAt: java.sql.Timestamp,
  ): DataFrame = {
    val upserts = plan
      .where(col("action").isin(Action.Load, Action.Replace))
      .select(
        PartitionKey.columns.map(col) :+
          col("state_run_id").as("run_id") :+
          col("state_schema_version").as("schema_version") :+
          lit(loadedAt).as("loaded_at"): _*
      )
    val demotes = plan.where(col("action") === Action.Demote)
      .select(PartitionKey.columns.map(col): _*)
    val kept = pointers
      .join(demotes, PartitionKey.columns, "left_anti")
      .join(upserts.select(PartitionKey.columns.map(col): _*), PartitionKey.columns, "left_anti")
    kept.select(upserts.columns.map(col): _*).unionByName(upserts)
  }

  /** Fact-table dedup-on-write: enforce the serving PK (one row per
    * grain, warehouse_tables.sql:2-23) by keeping the newest run's row.
    */
  def enforcePrimaryKey(df: DataFrame, pk: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(desc(orderCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }
}
