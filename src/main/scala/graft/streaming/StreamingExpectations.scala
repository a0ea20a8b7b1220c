package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Expectations

/** Streaming twin of the [[graft.ops.Expectations]] gate: every
  * micro-batch is evaluated against the SAME declarative rule set the
  * batch pipeline gates on, and the verdicts land in a results table
  * `(batch_id, rule, n_checked, n_violations, pass)` — the shape an
  * ingest monitor alerts on ("batch 17 started violating the domain
  * rule") and a replay audit reads back.
  *
  * Semantics and their honest limits:
  *  - row-local rules (NotNull / InSet / Predicate) are SUM-
  *    decomposable: the per-batch violation counts add up to exactly
  *    the batch-mode evaluation of the union (spec-pinned) — the gate
  *    loses nothing by streaming;
  *  - [[Expectations.Unique]] and [[Expectations.RefIntegrity]] are
  *    NOT batch-decomposable (a duplicate across batches is invisible
  *    inside either batch; the dimension can change between batches).
  *    Cross-batch uniqueness belongs to keyed state — the
  *    dropDuplicates / [[StreamingIncrementalDedup]] machinery — so
  *    [[attach]] REJECTS those rules loudly instead of miscounting.
  *
  * State: none beyond the foreachBatch frame — each batch's verdict is
  * one conditional-aggregation pass over that batch (the q226 plan at
  * batch granularity), appended to the results table. Bounded by
  * construction at any stream length.
  */
object StreamingExpectations {

  private def decomposable(r: Expectations.Rule): Boolean = r match {
    case _: Expectations.NotNull | _: Expectations.InSet | _: Expectations.Predicate => true
    case _ => false
  }

  /** Evaluate one batch and append verdicts to `resultsPath`. Exposed
    * for direct replay-semantics testing. Evaluates unconditionally —
    * an emptiness probe would cost an extra job AND a second
    * computation of the uncached batch frame on the streaming hot
    * path; an empty batch simply verdicts as n_checked = 0 / pass.
    */
  def gateBatch(rules: Seq[Expectations.Rule], resultsPath: String)(
      df: DataFrame, batchId: Long): Unit = {
    Expectations.evaluate(df, rules)
      .withColumn("batch_id", lit(batchId))
      .select("batch_id", "rule", "n_checked", "n_violations", "pass")
      .write.mode("append").parquet(resultsPath)
  }

  /** Attach the gate to a streaming frame; caller configures trigger /
    * checkpoint and calls `.start()`. Only sum-decomposable rules are
    * accepted (see scaladoc).
    */
  def attach(
      stream: DataFrame,
      rules: Seq[Expectations.Rule],
      resultsPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val bad = rules.filterNot(decomposable)
    require(bad.isEmpty,
      s"rules not sum-decomposable over micro-batches: ${bad.map(_.name).mkString(", ")} — " +
        "cross-batch uniqueness/referential checks need keyed state (see StreamingIncrementalDedup)")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(gateBatch(rules, resultsPath) _)
  }

  /** The accumulated verdict table, deduped to one row per
    * (batch_id, rule) — a batch REPLAYED after a crash appends its
    * verdicts again (foreachBatch re-invokes with the same batchId;
    * the rows are identical because the rules are deterministic over
    * the replayed frame), and this reader absorbs that so consumers
    * summing `n_violations` never double-count a retry. The raw
    * append log stays available at `resultsPath` for audits.
    */
  def results(spark: SparkSession, resultsPath: String): DataFrame =
    spark.read.parquet(resultsPath).dropDuplicates("batch_id", "rule")
}
