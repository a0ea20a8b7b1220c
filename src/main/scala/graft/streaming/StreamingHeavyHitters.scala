package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q63's exact heavy hitters: per tumbling window,
  * the most frequent keys over an UNBOUNDED key domain with BOUNDED
  * state — the SpaceSaving summary (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams"),
  * sharded across hash buckets so the operator scales horizontally.
  *
  * Why not the exact twin: a streaming exact count per key holds state
  * ∝ |distinct keys| — unbounded on an open domain (user agents, query
  * strings, URLs). SpaceSaving holds exactly k counters per bucket and
  * still guarantees, per (bucket, window) with event volume N:
  *   - every key with true count > N/k IS in the summary;
  *   - estimates only overestimate: true ≤ est ≤ true + err, with
  *     err ≤ N/k (each entry carries its own err bound).
  * Keys shard to buckets by a deterministic hash, so a key's events
  * all hit one summary and bucket summaries union without overlap —
  * merging is concatenation, the mergeable-summary property the q119/
  * q181 sketch tier relies on.
  *
  * Windows finalize exactly once, at watermark passage (the
  * StreamingAnomaly discipline): state per bucket is the OPEN windows'
  * summaries only — k entries each, window span bounded by the
  * lateness — and a closed window's rows never change. Late events
  * inside the horizon merge into their window's summary; events whose
  * window already closed are dropped (the admissibility bound every
  * watermarked operator shares).
  *
  * Determinism: arrival order affects WHICH cold key occupies an
  * evicted slot (inherent to SpaceSaving), but the guarantee above is
  * order-independent, and the spec pins it — plus eviction tie-breaks
  * (min est, then key) so a fixed replay is bit-stable.
  */
object StreamingHeavyHitters {

  /** One input observation: key at event time. */
  final case class KeyEvent(key: String, ts: java.sql.Timestamp)

  /** One SpaceSaving counter: est overestimates the true count by at
    * most err (the evicted predecessor's estimate).
    */
  final case class SSEntry(key: String, est: Long, err: Long)

  final case class WinSummary(win: Long, entries: Seq[SSEntry])

  final case class HHState(wins: Seq[WinSummary])

  /** One finalized heavy-hitter row; `winStart` is epoch millis of the
    * tumbling window start (integer — timezone-fixture-proof).
    */
  final case class HeavyHitter(bucket: Int, winStart: Long, key: String, est: Long, err: Long)

  /** Deterministic shard of a key (String.hashCode is JVM-spec'd). */
  private[streaming] def bucketOf(key: String, nBuckets: Int): Int =
    ((key.hashCode % nBuckets) + nBuckets) % nBuckets

  /** One SpaceSaving step: hit → increment; room → insert fresh;
    * full → evict the (min est, then min key) entry and inherit its
    * estimate as the newcomer's error bound.
    */
  private[streaming] def step(entries: Vector[SSEntry], key: String, k: Int): Vector[SSEntry] = {
    val i = entries.indexWhere(_.key == key)
    if (i >= 0) entries.updated(i, entries(i).copy(est = entries(i).est + 1))
    else if (entries.size < k) entries :+ SSEntry(key, 1L, 0L)
    else {
      val victim = entries.minBy(e => (e.est, e.key))
      entries.filterNot(_ eq victim) :+ SSEntry(key, victim.est + 1, victim.est)
    }
  }

  /** @param events   streaming key observations
    * @param k        counters per bucket (the state bound; err ≤ N/k)
    * @param nBuckets hash shards (horizontal scale of the summary)
    * @param windowMs tumbling window length in millis
    * @param lateness watermark delay bounding out-of-orderness
    * @return append-mode stream: each (bucket, window)'s final summary
    *         rows, emitted exactly once at watermark passage
    */
  def heavyHitterStream(
      events: Dataset[KeyEvent],
      k: Int = 16,
      nBuckets: Int = 8,
      windowMs: Long = 3600000L,
      lateness: String = "10 minutes",
  ): Dataset[HeavyHitter] = {
    implicit val he: org.apache.spark.sql.Encoder[HeavyHitter] = Encoders.product[HeavyHitter]
    implicit val ie: org.apache.spark.sql.Encoder[Int] = Encoders.scalaInt
    implicit val se: org.apache.spark.sql.Encoder[HHState] = Encoders.product[HHState]

    events
      .withWatermark("ts", lateness)
      .groupByKey(e => bucketOf(e.key, nBuckets))
      .flatMapGroupsWithState[HHState, HeavyHitter](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout(),
      ) { (bucket: Int, it: Iterator[KeyEvent], state: GroupState[HHState]) =>
        val wmMs = state.getCurrentWatermarkMs()
        val prior = state.getOption.getOrElse(HHState(Vector.empty))
        val merged =
          if (state.hasTimedOut) prior
          else {
            val wins = scala.collection.mutable.Map.empty[Long, Vector[SSEntry]]
            prior.wins.foreach(w => wins(w.win) = w.entries.toVector)
            it.foreach { e =>
              val win = (StreamTime.micros(e.ts) / 1000L / windowMs) * windowMs
              if (win + windowMs >= wmMs) // admissible: window still open
                wins(win) = step(wins.getOrElse(win, Vector.empty), e.key, k)
            }
            HHState(wins.toVector.sortBy(_._1).map { case (w, es) => WinSummary(w, es) })
          }
        val (ready, open) = merged.wins.partition(w => w.win + windowMs < wmMs)
        // State is OPEN WINDOWS ONLY: when every window finalized, remove
        // the entry outright — an empty HHState with no timeout would sit
        // in the store forever (one per bucket ever seen).
        if (open.isEmpty) state.remove()
        else {
          state.update(HHState(open))
          state.setTimeoutTimestamp(
            math.max(open.iterator.map(_.win + windowMs).min, wmMs + 1L))
        }
        ready.sortBy(_.win).iterator.flatMap { w =>
          w.entries.sortBy(e => (-e.est, e.key)).iterator
            .map(e => HeavyHitter(bucket, w.win, e.key, e.est, e.err))
        }
      }
  }
}
