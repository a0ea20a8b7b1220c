package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ops.DpNoise

/** Streaming twin of q241's ε-DP histogram release: per finalized
  * tumbling day window, the (event_type, day) count plus two-sided-
  * geometric noise — the release a privacy-bounded metrics pipeline
  * publishes CONTINUOUSLY instead of in a nightly batch.
  *
  * The twin needs NO custom state operator: a watermarked windowed
  * aggregate in APPEND mode already gives exactly-once finalization
  * (a window's row emits when the watermark passes its end and never
  * again), and the noise is a pure function of the emitted cell's key
  * ([[DpNoise]] — seeded by (event_type, epoch-day)), so:
  *
  *   - a micro-batch REPLAY after a crash re-derives the identical
  *     draw — the release is idempotent and the ε-ledger is charged
  *     once per cell, not once per attempt (the Chamandy
  *     determinism lesson applied to privacy accounting);
  *   - the streaming release is BIT-IDENTICAL to what the batch query
  *     would publish for the same closed day (the spec pins stream ≡
  *     batch-formula on the same data — the q74/q215 twin contract);
  *   - late events inside the watermark horizon merge into their
  *     still-open window BEFORE the single release; events past the
  *     horizon are dropped, never published as a correction (a DP
  *     release must not be revised — each revision is a fresh ε
  *     spend).
  *
  * Scale: per-key state is only the OPEN windows' partial counts
  * (bounded by the lateness horizon); the noise column is stateless
  * scalar arithmetic on the |types|-bounded emitted rows.
  */
object StreamingDpRelease {

  final case class TypedEvent(event_type: String, ts: java.sql.Timestamp)

  private val MsPerDay = 86400000L

  /** @param events   streaming (event_type, ts) observations
    * @param lateness watermark delay bounding out-of-orderness
    * @return append-mode stream of one (event_type, day, true_n,
    *         noise, released) row per finalized day cell; `day` is
    *         days since the epoch (integer — timezone-fixture-proof).
    *         `true_n` stays inside the trust boundary; only
    *         (event_type, day, released) ships.
    */
  def releaseStream(
      events: Dataset[TypedEvent],
      lateness: String = "1 day",
  ): DataFrame = {
    val day = (unix_millis(col("win.start")) / MsPerDay).cast("long")
    events
      .withWatermark("ts", lateness)
      .groupBy(col("event_type"), window(col("ts"), "1 day").as("win"))
      .agg(count(lit(1)).as("true_n"))
      .select(col("event_type"), day.as("day"), col("true_n"),
        DpNoise.twoSidedGeometric(concat(lit("graft-dp-stream:"),
          col("event_type"), lit(":"), day.cast("string"))).as("noise"))
      .withColumn("released", col("true_n") + col("noise"))
  }
}
