package graft.state

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{PartitionKey, PartitionState, Schemas}

/** Parquet-backed partition-state ledger with SQLite-upsert semantics
  * (reference: state_store.py:40-163; docs/state_store_contract.md).
  *
  * Vanilla Spark has no mutable table, so the ledger is a chain of
  * immutable versioned snapshots with an atomically-swapped `_CURRENT`
  * pointer — the same metadata-last publish trick the raw sink uses,
  * and a miniature of how Delta/Iceberg do it:
  *
  * {{{
  * <root>/v00001/part-*.parquet     # full snapshot
  * <root>/v00002/part-*.parquet
  * <root>/_CURRENT                  # contains "v00002" — the commit point
  * }}}
  *
  * `upsert(delta)` = read current ∪ delta → window-dedup keeping the
  * winning row per key → write next version → swap pointer. Writers are
  * last-writer-wins at the row level (D1) with the validator's
  * authority ordering (D2): higher `run_id` wins FIRST (ISO string
  * order == time order; an older run that merely finishes validating
  * later must not regress authority, validator.py:64-70), then higher
  * `updated_at`, then a deterministic payload tie-break (status rank,
  * then remaining columns) so the comparator is a *total* order and
  * upsert is genuinely order-independent.
  *
  * Scale: the ledger has one row per logical partition — millions of
  * rows at 100 TB of payload, i.e. a *small* table. Snapshot rewrite is
  * a single narrow shuffle on the 4-column key; observe queries below
  * are ordinary aggregations over it.
  */
final class StateStore(spark: SparkSession, root: String) {
  import StateStore._

  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(hadoopConf)

  private def currentVersion(): Option[Int] = {
    val p = new Path(root, CurrentFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.stripPrefix("v").toInt)
      finally in.close()
    }
  }

  /** Current snapshot; empty (correct schema) before the first commit —
    * the reference's "missing row ⇒ pending" implicit state
    * (decisions.md:41-44).
    */
  def snapshot(): DataFrame = currentVersion() match {
    case Some(v) => spark.read.schema(Schemas.partitionState).parquet(versionDir(v))
    case None => spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), Schemas.partitionState)
  }

  private def versionDir(v: Int): String = f"$root/v$v%05d"

  /** D1+D2: merge `delta` into the ledger. Winner per key: greatest
    * run_id FIRST (max-run_id authority, validator.py:64-70 — an older
    * run that merely finishes validating later must NOT regress
    * authority), then greatest updated_at as the tie-break for
    * same-run control-plane transitions (retry/mark-terminal preserve
    * current_run_id). Null run_ids (pending placeholders) lose to any
    * run.
    *
    * Rows tying on BOTH (run_id, updated_at) — e.g. two control-plane
    * transitions stamped in the same instant — are resolved by a
    * deterministic payload order: terminal-ness of status
    * (success > failed > pending: a terminal outcome recorded at the
    * same instant as a provisional one wins, matching
    * validator.py:56-62's "terminal states are never silently
    * demoted"), then attempt_count, record_count, error_message,
    * schema_version. After all of these, any remaining "tie" is
    * between byte-identical rows, so row_number's pick is immaterial:
    * the comparator is total over distinct rows, which is what makes
    * upsert order-independent (GraftProperties, pinned under multiple
    * seeds in StateStoreSpec).
    */
  def upsert(delta: DataFrame): Unit = {
    val next = currentVersion().map(_ + 1).getOrElse(1)
    val statusRank = when(col("status") === PartitionState.Success, 3)
      .when(col("status") === PartitionState.Failed, 2)
      .otherwise(1)
    val w = Window
      .partitionBy(PartitionKey.columns.map(col): _*)
      .orderBy(
        desc_nulls_last("current_run_id"),
        desc("updated_at"),
        statusRank.desc,
        desc("attempt_count"),
        desc("record_count"),
        desc_nulls_last("error_message"),
        desc("schema_version"),
      )
    val merged = snapshot()
      .unionByName(delta.select(Schemas.partitionState.fieldNames.map(col): _*))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    // A version dir not referenced by _CURRENT is an orphan from a
    // crashed upsert (written but never committed) — safe to replace.
    merged.write.mode("overwrite").parquet(versionDir(next))
    commit(next)
  }

  /** Atomic commit: write pointer to a temp file, rename-with-OVERWRITE
    * over _CURRENT (FileContext rename is atomic-replace on posix and
    * HDFS; a delete-then-rename would leave a window where the ledger
    * reads as empty). On object stores the PUT of the pointer object is
    * itself atomic.
    */
  private def commit(v: Int): Unit = {
    val tmp = new Path(root, s"$CurrentFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(f"v$v%05d".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(new Path(root).toUri, hadoopConf)
    fc.rename(
      fs.makeQualified(tmp),
      fs.makeQualified(new Path(root, CurrentFile)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE,
    )
  }

  /** S7/F2/F3/T1: filtered, ordered, limited listing
    * (state_store.py:75-121).
    */
  def list(
      status: Option[String] = None,
      customerId: Option[String] = None,
      queryName: Option[String] = None,
      since: Option[java.sql.Date] = None,
      until: Option[java.sql.Date] = None,
      limit: Option[Int] = None,
  ): DataFrame = {
    var df = snapshot()
    status.foreach(v => df = df.where(col("status") === v))
    customerId.foreach(v => df = df.where(col("customer_id") === v))
    queryName.foreach(v => df = df.where(col("query_name") === v))
    since.foreach(v => df = df.where(col("logical_date") >= v))
    until.foreach(v => df = df.where(col("logical_date") <= v))
    df = df.orderBy(desc("updated_at"))
    limit.map(df.limit).getOrElse(df)
  }

  /** S8: point lookup. */
  def get(key: PartitionKey): DataFrame =
    snapshot().where(
      col("source") === key.source &&
        col("customer_id") === key.customerId &&
        col("query_name") === key.queryName &&
        col("logical_date") === key.logicalDate
    )
}

object StateStore {
  val CurrentFile = "_CURRENT"

  /** Observe-command aggregations (reference cli.py:254-490) as pure
    * DataFrame transforms over a ledger snapshot — each mirrors a §2.1
    * operator and reuses the same shapes as q06-q15.
    */
  object observe {

    /** A1: status → count (cli.py:266-274). */
    def statusCounts(states: DataFrame): DataFrame =
      states.groupBy("status").agg(count(lit(1)).as("cnt")).orderBy("status")

    /** A2: attempt-count min/max/avg (cli.py:282-291). */
    def attemptStats(states: DataFrame): DataFrame =
      states.agg(
        min("attempt_count").as("min_attempts"),
        max("attempt_count").as("max_attempts"),
        avg("attempt_count").as("avg_attempts"),
      )

    /** A3: per (source, query_name) logical-date range (cli.py:275-281). */
    def dateRanges(states: DataFrame): DataFrame =
      states
        .groupBy("source", "query_name")
        .agg(min("logical_date").as("earliest"), max("logical_date").as("latest"))
        .orderBy("source", "query_name")

    /** A4: attempt histogram buckets 1-2/3-5/6-10/10+ (cli.py:439-456),
      * ordered by bucket lower bound (lexicographic label order would
      * put "10+" second).
      */
    def attemptHistogram(states: DataFrame): DataFrame =
      states
        .select(
          when(col("attempt_count") <= 2, 0)
            .when(col("attempt_count") <= 5, 1)
            .when(col("attempt_count") <= 10, 2)
            .otherwise(3)
            .as("idx")
        )
        .groupBy("idx")
        .agg(count(lit(1)).as("cnt"))
        .select(
          element_at(lit(Array("1-2", "3-5", "6-10", "10+")), col("idx") + 1).as("bucket"),
          col("cnt"),
          col("idx"),
        )
        .orderBy("idx")
        .drop("idx")

    /** T2: worst failed partitions (cli.py:308-318), terminal split per
      * F4.
      */
    def topFailed(states: DataFrame, n: Int): DataFrame =
      states
        .where(col("status") === PartitionState.Failed)
        .withColumn(
          "terminal",
          graft.functions.EtlFunctions.isTerminal(col("error_message")),
        )
        .orderBy(desc("attempt_count"), asc("customer_id"), asc("query_name"), asc("logical_date"))
        .limit(n)

    /** E1: missing logical_dates per (source, query_name) between each
      * group's min and max (cli.py:381-398) — sequence/explode/anti-join,
      * same shape as q13.
      */
    def dateGaps(states: DataFrame): DataFrame = {
      val present = states
        .where(col("status") === PartitionState.Success)
        .select(col("source"), col("query_name"), col("logical_date"))
        .distinct()
      val spans = present
        .groupBy("source", "query_name")
        .agg(min("logical_date").as("lo"), max("logical_date").as("hi"))
        .select(
          col("source"),
          col("query_name"),
          explode(sequence(col("lo"), col("hi"))).as("logical_date"),
        )
      spans
        .join(present, Seq("source", "query_name", "logical_date"), "left_anti")
        .orderBy("source", "query_name", "logical_date")
    }

    /** E3: freshness lag vs an anchor date (cli.py:350-365). */
    def freshness(states: DataFrame, anchor: java.sql.Date): DataFrame =
      states
        .where(col("status") === PartitionState.Success)
        .groupBy("source", "query_name")
        .agg(max("logical_date").as("latest"))
        .select(
          col("source"),
          col("query_name"),
          col("latest"),
          datediff(lit(anchor), col("latest")).cast("long").as("lag_days"),
        )
        .orderBy("source", "query_name")

    /** E2: backfill enumeration (cli.py:597-655): every date in
      * [since, until] for each (source, customer, query) combo not
      * already in the ledger → pending rows to insert.
      */
    def backfillPlan(
        states: DataFrame,
        combos: DataFrame, // source, customer_id, query_name
        since: java.sql.Date,
        until: java.sql.Date,
    ): DataFrame = {
      val dates = combos.select(
        col("source"),
        col("customer_id"),
        col("query_name"),
        explode(sequence(lit(since), lit(until))).as("logical_date"),
      )
      dates.join(states.select(PartitionKey.columns.map(col): _*), PartitionKey.columns, "left_anti")
    }
  }
}
