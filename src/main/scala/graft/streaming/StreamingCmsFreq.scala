package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming twin of batch q196 (`graft.ops.SketchQueries.q196`):
  * per-group point-frequency estimates with the CountMin sketch AS
  * STATE-STORE STATE — the 18th streaming twin, and like the KMV twin
  * an EXACT stream-equals-batch contract: CMS counters ADD, addition
  * commutes and associates, so after any interleaving of arrivals
  * across any micro-batch slicing the counter table — and therefore
  * every point estimate — equals what the batch build computes over
  * the same rows, bit for bit (the merge identity q196 gets "by
  * construction" from its map-side-combined groupBy becomes the fold
  * here). The spec pins exactly that, under scrambled orders,
  * different slicings, and both state-store providers.
  *
  * The served surface is what CMS exists for: point queries ("how many
  * events has user X generated?") answered live per trigger from KB of
  * state, for a consumer-supplied probe set — a dashboard's watchlist,
  * an abuse team's suspect ids — without storing per-user counts. The
  * probes' buckets are computed once, driver-side, with a Scala
  * replica of the SAME portable hash ([[hash60]], bit-parity-pinned in
  * spec against the Column form), and the bucket rule itself is
  * single-sourced from `SketchQueries.cmsBucket`, so the stream, the
  * batch query, and the DuckDB oracle share one hash family by
  * construction.
  *
  * State story at 100 TB: d·w BIGINT counters per group (32 KB at the
  * q196 geometry — independent of history length and of the user-id
  * cardinality an exact per-user count would hoard); arrivals shuffle
  * once on the group key; bucket projection is executor-local. The
  * estimate is `min over d of counter[r][bucket_r(key)]` — one-sided
  * (est ≥ exact), overshoot ≤ N/w per row in expectation, the same
  * integer arithmetic as the batch form.
  */
object StreamingCmsFreq {

  /** One arrival, bucketed: the group key and the d CMS cell indices. */
  final case class BucketedEvent(event_type: String, bs: Seq[Int])

  /** Per-group CMS state: d·w counters, row-major (r·w + b). */
  final case class CmsState(counters: Array[Long])

  /** Per-trigger emission: the group's current estimate for one probe
    * key, plus the group's total arrival count (the N of the ≤ N/w
    * overshoot contract — observable error-bound evidence).
    */
  final case class Freq(event_type: String, user_id: Long, est_n: Long, total_n: Long)

  /** Scala replica of `MinHash.portableHash60` (first 15 hex chars of
    * the md5 digest as a 60-bit non-negative long) — lets probe
    * buckets be computed driver-side without a Spark job. Bit-parity
    * with the Column form is pinned in spec.
    */
  private[streaming] def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** The d bucket indices of a key under the q196 geometry. */
  private[streaming] def bucketsOf(userId: Long, d: Int, w: Long): Seq[Int] =
    (0 until d).map(r => (hash60(s"cms$r|$userId") % w).toInt)

  /** Fold a micro-batch of bucketed arrivals into the counter state —
    * the CMS merge (counters add; O(d) per arrival, independent of
    * history length).
    */
  private[streaming] def fold(
      state: Option[CmsState], arrivals: Iterator[Seq[Int]], d: Int, w: Int): CmsState = {
    val c = state.map(_.counters.clone()).getOrElse(Array.fill(d * w)(0L))
    arrivals.foreach { bs =>
      var r = 0
      while (r < d) { c(r * w + bs(r)) += 1L; r += 1 }
    }
    CmsState(c)
  }

  /** The point estimate for pre-computed probe buckets: min over d. */
  private[streaming] def estimate(c: Array[Long], bs: Seq[Int], w: Int): Long =
    bs.iterator.zipWithIndex.map { case (b, r) => c(r * w + b) }.min

  /** The stateful point-frequency query over a (event_type, user_id)
    * stream: Update-mode per-(group, probe) estimates, refreshed every
    * trigger. `d`/`w` must match the batch query's (4×1024) for the
    * parity contract.
    */
  def freqStream(events: DataFrame, probes: Seq[Long], d: Int = 4, w: Int = 1024): Dataset[Freq] = {
    require(probes.nonEmpty, "freqStream needs at least one probe key")
    implicit val ke: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val be: org.apache.spark.sql.Encoder[BucketedEvent] = Encoders.product[BucketedEvent]
    implicit val se: org.apache.spark.sql.Encoder[CmsState] = Encoders.product[CmsState]
    implicit val fe: org.apache.spark.sql.Encoder[Freq] = Encoders.product[Freq]
    val probeBuckets: Seq[(Long, Seq[Int])] = probes.map(p => p -> bucketsOf(p, d, w))
    events
      .where(col("user_id").isNotNull)
      .select(
        col("event_type"),
        array((0 until d).map(r =>
          graft.ops.SketchQueries.cmsBucket(r, col("user_id"), w).cast("int")): _*).as("bs"))
      .as[BucketedEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CmsState, Freq](
        org.apache.spark.sql.streaming.OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[BucketedEvent], state: org.apache.spark.sql.streaming.GroupState[CmsState]) =>
          val next = fold(state.getOption, it.map(_.bs), d, w)
          state.update(next)
          // total arrivals = any counter row's sum (every arrival adds
          // 1 to exactly one cell per row) — row 0 by convention
          val total = { var s = 0L; var i = 0; while (i < w) { s += next.counters(i); i += 1 }; s }
          probeBuckets.iterator.map { case (p, bs) =>
            Freq(key, p, estimate(next.counters, bs, w), total)
          }
      }
  }
}
