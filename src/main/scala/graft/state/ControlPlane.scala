package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.EtlFunctions
import graft.model.PartitionState

/** Control-plane bulk state transitions (reference cli.py:138-232
  * retry, 580-664 backfill, 493-577 mark-terminal;
  * docs/control_plane.md), with the reference's safety rails: bulk
  * operations above a confirmation threshold refuse to run unless
  * forced (cli.py:36-37 — retry_threshold=20, backfill_threshold=100).
  *
  * Each planner returns the DELTA rows to feed [[StateStore.upsert]] —
  * planning is pure and inspectable (the reference's dry-run contract)
  * and the ledger mutation stays in one place.
  */
object ControlPlane {

  val RetryThreshold = 20
  val BackfillThreshold = 100

  /** Backoff policy (docs/retry_daemon.md:14-18): base 5 min doubling
    * per attempt, capped at 6 h, ±30 s jitter.
    */
  val BackoffBaseSeconds = 5L * 60L
  val BackoffCapSeconds = 6L * 3600L
  val BackoffJitterSeconds = 30L

  /** delay_for(attempt_count) = min(base · 2^(n−1), cap), in seconds.
    * Computed in double so huge attempt counts saturate at the cap
    * instead of overflowing.
    */
  def backoffDelaySeconds(attemptCount: Column): Column =
    least(
      lit(BackoffCapSeconds.toDouble),
      lit(BackoffBaseSeconds.toDouble) *
        pow(lit(2.0), greatest(attemptCount.cast("double") - 1.0, lit(0.0))),
    ).cast("long")

  /** Earliest instant the next retry may run:
    * `updated_at + delay_for(attempt_count) + jitter`, where jitter is
    * a DETERMINISTIC hash of the partition key in
    * [−BackoffJitterSeconds, +BackoffJitterSeconds] — the thundering-
    * herd spread the spec wants, without `rand()` (a retry-safe task
    * must compute the same schedule on every evaluation; cf. the same
    * rule in [[graft.ops.Skew]] salting).
    */
  def nextAttemptAt(states: DataFrame): DataFrame = {
    val span = 2 * BackoffJitterSeconds + 1
    val jitter = pmod(
      xxhash64(col("source"), col("customer_id"), col("query_name"), col("logical_date")),
      lit(span)) - BackoffJitterSeconds
    states.withColumn(
      "next_attempt_at",
      timestamp_micros(
        unix_micros(col("updated_at")) +
          (backoffDelaySeconds(col("attempt_count")) + jitter) * 1000000L),
    )
  }

  final case class ThresholdExceeded(op: String, count: Long, threshold: Int)
      extends RuntimeException(
        s"$op would touch $count partitions (> $threshold); pass force=true to proceed")

  private def rail(op: String, df: DataFrame, threshold: Int, force: Boolean): DataFrame = {
    if (!force) {
      val n = df.count()
      if (n > threshold) throw ThresholdExceeded(op, n, threshold)
    }
    df
  }

  /** Retry sweep (cli.py:138-232 + docs/retry_daemon.md:22): failed,
    * NON-terminal partitions under the attempt cap whose backoff
    * window has elapsed (`updatedAt >= next_attempt_at`, i.e. the
    * spec's `now - updated_at >= delay_for(attempt_count)` with the
    * deterministic jitter folded in) flip back to pending.
    * attempt_count is PRESERVED — the validator increments it when the
    * re-attempt is actually processed (validator.py:83); incrementing
    * here too would double-count attempts and inflate the exponential
    * backoff. Pass `respectBackoff = false` for the CLI-style manual
    * retry that ignores the schedule.
    */
  def retryPlan(
      states: DataFrame,
      maxAttempts: Long,
      updatedAt: java.sql.Timestamp,
      customerId: Option[String] = None,
      queryName: Option[String] = None,
      force: Boolean = false,
      respectBackoff: Boolean = true,
  ): DataFrame = {
    var df = states
      .where(col("status") === PartitionState.Failed)
      .where(!EtlFunctions.isTerminal(col("error_message")))
      .where(col("attempt_count") < maxAttempts)
    customerId.foreach(v => df = df.where(col("customer_id") === v))
    queryName.foreach(v => df = df.where(col("query_name") === v))
    if (respectBackoff)
      df = nextAttemptAt(df).where(lit(updatedAt) >= col("next_attempt_at")).drop("next_attempt_at")
    val delta = df
      .withColumn("status", lit(PartitionState.Pending))
      .withColumn("updated_at", lit(updatedAt))
    rail("retry", delta, RetryThreshold, force)
  }

  /** Mark-terminal sweep (cli.py:493-577): stamp the `[terminal]`
    * marker (idempotently, X6) on failed partitions matching the
    * filters so the retry daemon skips them permanently. Mirrors the
    * reference's rails: refusing a fully-unfiltered sweep without
    * `force` (cli.py:523-525), plus the bulk threshold.
    */
  def markTerminalPlan(
      states: DataFrame,
      updatedAt: java.sql.Timestamp,
      minAttempts: Long = 0L,
      customerId: Option[String] = None,
      queryName: Option[String] = None,
      since: Option[java.sql.Date] = None,
      until: Option[java.sql.Date] = None,
      force: Boolean = false,
  ): DataFrame = {
    if (customerId.isEmpty && queryName.isEmpty && since.isEmpty && until.isEmpty &&
      minAttempts == 0L && !force)
      throw new IllegalArgumentException(
        "refusing to mark ALL failed partitions terminal without filters; " +
          "provide a filter or pass force=true (cli.py:523-525)")
    var df = states
      .where(col("status") === PartitionState.Failed)
      .where(col("attempt_count") >= minAttempts)
      .where(!EtlFunctions.isTerminal(col("error_message")))
    customerId.foreach(v => df = df.where(col("customer_id") === v))
    queryName.foreach(v => df = df.where(col("query_name") === v))
    since.foreach(v => df = df.where(col("logical_date") >= v))
    until.foreach(v => df = df.where(col("logical_date") <= v))
    val delta = df
      .withColumn("error_message",
        EtlFunctions.markTerminal(coalesce(col("error_message"), lit("marked by control plane"))))
      .withColumn("updated_at", lit(updatedAt))
    rail("mark-terminal", delta, RetryThreshold, force)
  }

  /** Backfill planner (cli.py:580-664): enumerate missing dates per
    * combo (E2, via [[StateStore.observe.backfillPlan]]) and emit
    * pending ledger rows, rail-checked at the backfill threshold.
    */
  def backfillPendingRows(
      states: DataFrame,
      combos: DataFrame,
      since: java.sql.Date,
      until: java.sql.Date,
      updatedAt: java.sql.Timestamp,
      force: Boolean = false,
  ): DataFrame = {
    val missing = StateStore.observe.backfillPlan(states, combos, since, until)
    val delta = missing.select(
      col("source"), col("customer_id"), col("query_name"), col("logical_date"),
      lit(PartitionState.Pending).as("status"),
      lit(null).cast("string").as("current_run_id"),
      lit("v1").as("schema_version"),
      lit(0L).as("record_count"),
      lit(updatedAt).as("updated_at"),
      lit(null).cast("string").as("error_message"),
      lit(0L).as("attempt_count"),
    )
    rail("backfill", delta, BackfillThreshold, force)
  }

  /** T3: oldest / newest failed partition (cli.py:326-336,476-488). */
  def oldestNewestFailed(states: DataFrame): DataFrame = {
    val failed = states.where(col("status") === PartitionState.Failed)
    failed.orderBy(asc("updated_at")).limit(1).withColumn("which", lit("oldest"))
      .unionByName(failed.orderBy(desc("updated_at")).limit(1).withColumn("which", lit("newest")))
  }
}
