package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch q27/q28 operators
  * (SURVEY.md §2.2-H). The reference is batch-only, but its late-data
  * semantics map exactly: the 2-day lookback re-extraction window
  * (pipeline.py:164-178) ≡ a watermark that admits late events for a
  * bounded horizon and then finalizes; the metadata seal ≡ watermark-
  * gated emission (a window's aggregate is emitted only once no
  * earlier data can arrive).
  *
  * Both transforms accept any DataFrame with (ts: timestamp, user_id,
  * value) — batch or streaming. On a streaming source they require a
  * watermark to bound state; state is keyed by (user, window) and
  * evicted at watermark passage, so executor memory stays O(active
  * windows), not O(history) — the property that matters for an
  * unbounded 100 TB/day stream.
  */
object StreamingOps {

  /** q28 twin: tumbling 1-hour counts + sums per user, late data beyond
    * `lateness` dropped (reference lookback supersession).
    */
  def tumblingCounts(events: DataFrame, lateness: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(
        col("user_id"),
        col("w.start").as("hour_start"),
        col("n_events"),
        col("sum_value"),
      )

  /** q54 twin: hopping (sliding) windows — size/slide overlapping
    * windows per event, the same `window(ts, size, slide)` expression as
    * the batch q54, under a watermark. State is (window × group) keyed;
    * each event updates size/slide window aggregates (2 for 10m/5m) and
    * a window's state is evicted once the watermark passes its end — so
    * overlap multiplies state by a constant factor, not by history.
    */
  def hoppingCounts(
      events: DataFrame,
      size: String = "10 minutes",
      slide: String = "5 minutes",
      lateness: String = "2 days",
  ): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(
        col("w.start").as("win_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value"),
      )

  /** D1/D2 streaming twin: exactly-once-per-key dedup within the
    * watermark horizon (`dropDuplicatesWithinWatermark`). This is the
    * reference's run-fence supersession viewed as a stream: replayed /
    * duplicate extraction rows inside the lookback window collapse to
    * one; state for a key is dropped once the watermark passes it, so
    * dedup state is bounded by the horizon, not the stream length.
    */
  def dedupWithinHorizon(events: DataFrame, idCols: Seq[String], lateness: String = "2 days"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(idCols)

  /** q44 twin: the C4-style cleaning pipeline on an unbounded document
    * stream. The quality gates (token-length, stopword mass) are
    * stateless filters — identical expressions to the batch
    * [[graft.llm.TextPipeline.cleanCorpus]] — and the exact-dedup
    * stage becomes first-SEEN-wins within the watermark horizon
    * (`dropDuplicatesWithinWatermark` on the content hash; the batch
    * form's min-doc_id winner needs a global order no stream has).
    * State = one hash per surviving doc inside the horizon, evicted at
    * watermark passage — bounded for an unbounded stream.
    */
  def cleanStream(
      docs: DataFrame, // doc_id, text, ts
      stopwords: Seq[String],
      minTokens: Int,
      maxTokens: Int,
      minStopwordRatio: Double,
      lateness: String = "2 days",
  ): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    docs
      .withColumn("n_tokens", TF.tokenCountWs(col("text")))
      .withColumn("stopword_ratio", TF.stopwordRatio(col("text"), stopwords))
      .where(col("n_tokens").between(minTokens, maxTokens) &&
        col("stopword_ratio") >= minStopwordRatio)
      .withColumn("__h", md5(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("__h"))
      .drop("__h")
  }

  /** Stream-STREAM interval join (the q97 conversion shape live): each
    * left event pairs with right events of the same key whose
    * timestamp falls in [leftTs, leftTs + window] — view⋈purchase,
    * impression⋈click, signup⋈conversion — with BOTH sides unbounded
    * streams (the stream-static joins elsewhere in this package hold
    * one side fixed; this one buffers both).
    *
    * State contract (the reason this shape survives an unbounded
    * stream): both sides carry watermarks and the join condition
    * bounds rightTs to a window of leftTs, so Spark's symmetric hash
    * join evicts a buffered row as soon as the OTHER side's watermark
    * passes the last instant it could still match — per-side state is
    * O(events within lateness + window), never O(history).
    *
    * `leftOuter` additionally emits unmatched left events (null right
    * columns) once eviction proves no match can arrive — supported
    * precisely BECAUSE the time bound + watermark make "no match" a
    * finalizable fact.
    *
    * Column names must be disjoint across sides (rename before
    * calling — the returned frame carries both sides' columns).
    */
  def intervalJoinStreams(
      left: DataFrame,
      right: DataFrame,
      key: (String, String),
      ts: (String, String),
      window: String = "30 minutes",
      lateness: String = "10 minutes",
      joinType: String = "inner",
  ): DataFrame = {
    require(joinType == "inner" || joinType == "leftOuter",
      s"stream-stream interval join supports inner/leftOuter, got '$joinType'")
    left
      .withWatermark(ts._1, lateness)
      .join(
        right.withWatermark(ts._2, lateness),
        col(key._1) === col(key._2) &&
          col(ts._2) >= col(ts._1) &&
          col(ts._2) <= col(ts._1) + expr(s"INTERVAL $window"),
        joinType)
  }

  /** q27 twin: session windows with a 30-minute gap per user —
    * `session_window` keeps per-user open-session state and emits when
    * the watermark passes the gap.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes", lateness: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min("ts").as("first_ts"), max("ts").as("last_ts"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"),
      )
}
