package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch funnel (`graft.ops.AnalyticQueries.
  * funnelDepths`, q56): per-user conversion depth through an ordered
  * step sequence, each later step gated to `windowUs` after the user's
  * earliest completion of the prior step — computed over an unbounded,
  * out-of-order stream.
  *
  * Contract: one `Conversion` row per FUNNEL EPISODE. An episode
  * finalizes — emits and clears state — when the watermark passes the
  * point where its outcome can no longer change:
  *
  *  - depth == steps.length: past the last anchor (admissible events
  *    all carry ts ≥ watermark > every anchor, so no re-anchoring);
  *  - 0 < depth < steps.length: past `last anchor + window` (the first
  *    unresolved stage's deadline; also > every anchor);
  *  - depth == 0 (only later-step events buffered): past
  *    `max buffered ts + window` (a future step-0 event at ts ≥
  *    watermark could only convert with a later step in
  *    (ts, ts+window], and every buffered event is older than that).
  *
  * A user active AFTER finalization opens a NEW episode (their next
  * funnel attempt) — this is what bounds state for continuously-active
  * users: an episode's buffer spans at most the episode's own event
  * range, and the deadline rule finalizes it `window` past its last
  * anchor regardless of how busy the user stays afterwards. Two paths
  * enforce this: the event-time timeout (quiet keys), and an inline
  * drain in the data branch (keys with data in the trigger where the
  * deadline passes — Spark never fires timeouts for those). Buffered
  * events BEYOND a finalized episode's deadline (early arrivals for
  * the user's next attempt — the window gate proves they couldn't
  * have joined the old episode) are carried over as the next
  * episode's seed rather than swallowed. Batch
  * parity (`funnelDepths` = one global earliest-anchor pass) therefore
  * holds exactly for inputs whose per-user step events fall within one
  * episode — the spec pins both that case and the multi-episode case.
  *
  * In-horizon late data re-anchors correctly before finalization:
  * anchors are min-ts and recomputed from the buffered timestamps on
  * every batch.
  */
object StreamingFunnel {

  final case class StepEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)

  /** Per-step sorted distinct buffered timestamps (one episode's). */
  final case class FunnelBuf(stepTs: Seq[Seq[Long]])

  final case class Conversion(user_id: Long, depth: Int, last_anchor_us: Long)

  /** Greedy earliest-anchor depth over the buffered step timestamps —
    * the same decision function as the batch funnelDepths aggregation.
    * Returns (depth, anchor of the deepest completed stage; 0 if no
    * step-0 event buffered).
    */
  private[streaming] def resolve(stepTs: Seq[Seq[Long]], windowUs: Long): (Int, Long) = {
    var depth = 0
    var anchor = 0L
    var i = 0
    var open = true
    while (open && i < stepTs.length) {
      val candidates =
        if (i == 0) stepTs(i).headOption
        else stepTs(i).find(ts => ts > anchor && ts <= anchor + windowUs)
      candidates match {
        case Some(ts) => depth += 1; anchor = ts; i += 1
        case None => open = false
      }
    }
    (depth, anchor)
  }

  /** The episode's finalization deadline (µs): the earliest event time
    * the watermark must pass for the outcome to be immutable.
    */
  private[streaming] def deadlineUs(stepTs: Seq[Seq[Long]], windowUs: Long, nSteps: Int): Long = {
    val (depth, anchor) = resolve(stepTs, windowUs)
    if (depth == nSteps) anchor
    else if (depth > 0) anchor + windowUs
    else stepTs.iterator.flatMap(_.lastOption).foldLeft(0L)(math.max) + windowUs
  }

  /** Finalize every episode whose deadline the watermark has passed.
    * Buffered events beyond a finalized episode's deadline cannot have
    * influenced its outcome (the window gate excludes them from every
    * admissible chain), so they carry over as the START of the next
    * episode — which may itself already be expired (watermark jumps),
    * hence the loop. Returns (finalized (depth, anchor) pairs in
    * episode order, the still-open remainder).
    *
    * Strict `<` mirrors Spark's event-time timeout condition
    * (`timeoutTimestamp < watermark`), so the inline data-branch drain
    * and the timeout branch finalize at the same watermark.
    */
  private[streaming] def drainExpired(
      stepTs: Seq[Seq[Long]],
      wmMs: Long,
      windowUs: Long,
      nSteps: Int,
  ): (List[(Int, Long)], Seq[Seq[Long]]) = {
    val out = List.newBuilder[(Int, Long)]
    var cur = stepTs
    var open = false
    while (!open && cur.exists(_.nonEmpty)) {
      val dl = deadlineUs(cur, windowUs, nSteps)
      if (dl / 1000L < wmMs) {
        out += resolve(cur, windowUs)
        cur = cur.map(_.filter(_ > dl)) // next episode's seed
      } else open = true
    }
    (out.result(), cur)
  }

  def funnelStream(
      events: Dataset[StepEvent],
      steps: Seq[String],
      windowUs: Long,
      lateness: String = "2 days",
  ): Dataset[Conversion] = {
    require(steps.nonEmpty, "funnelStream needs at least one step")
    require(steps.distinct.size == steps.size,
      "funnelStream steps must be distinct (a repeated event_type would be bucketed ambiguously)")
    implicit val ce: org.apache.spark.sql.Encoder[Conversion] = Encoders.product[Conversion]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val be: org.apache.spark.sql.Encoder[FunnelBuf] = Encoders.product[FunnelBuf]
    val stepIdx = steps.zipWithIndex.toMap
    val nSteps = steps.length

    events
      .withWatermark("ts", lateness)
      .filter((e: StepEvent) => stepIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, Conversion](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout(),
      ) { (userId: Long, it: Iterator[StepEvent], state: GroupState[FunnelBuf]) =>
        val wmMs = state.getCurrentWatermarkMs()
        if (state.hasTimedOut) {
          val (eps, rest) = drainExpired(state.get.stepTs, wmMs, windowUs, nSteps)
          if (rest.exists(_.nonEmpty)) {
            // events beyond the drained deadlines: the next episode,
            // still open — re-arm for its own deadline.
            state.update(FunnelBuf(rest))
            state.setTimeoutTimestamp(
              math.max(deadlineUs(rest, windowUs, nSteps) / 1000L, wmMs + 1L))
          } else state.remove()
          eps.iterator.map { case (d, a) => Conversion(userId, d, a) }
        } else {
          // EventTimeTimeout only fires for keys with NO data in a
          // trigger, so an active key must finalize expired episodes
          // inline before merging: this batch's events (admissible ⇒
          // ts ≥ watermark > deadline) open the NEXT episode rather
          // than merging into a stale one.
          val (eps, rest) = drainExpired(
            state.getOption.map(_.stepTs)
              .getOrElse(Seq.fill(nSteps)(Vector.empty[Long])),
            wmMs, windowUs, nSteps)
          val incoming = it.toSeq
            .map(e => (stepIdx(e.event_type), StreamTime.micros(e.ts)))
            .groupBy(_._1) // one pass over the batch, not one per step
          val merged = rest.zipWithIndex.map { case (old, i) =>
            incoming.get(i) match {
              case None => old
              case Some(add) => (old ++ add.map(_._2)).distinct.sorted
            }
          }
          state.update(FunnelBuf(merged))
          // Fire once the watermark passes the episode deadline; clamp
          // above the current watermark (Spark rejects a timeout at or
          // before it — possible when this batch's data already lands
          // inside an expired window).
          val deadlineMs = deadlineUs(merged, windowUs, nSteps) / 1000L
          state.setTimeoutTimestamp(math.max(deadlineMs, wmMs + 1L))
          eps.iterator.map { case (d, a) => Conversion(userId, d, a) }
        }
      }
  }
}
