package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.llm.TextPipeline

/** Streaming twin of [[graft.llm.TextPipeline.incrementalCascade]]:
  * documents ARRIVE (a stream of (doc_id, text, ts)) and each is
  * checked against a static base corpus as it lands — the
  * continuous-ingest form of batch-vs-base dedup, where the batch form
  * runs nightly and this form answers "is this a near-dup?" at ingest
  * latency.
  *
  * Shape: the base side is the relational pipeline's shingle/signature
  * state, materialized ONCE (in production: read from the persisted
  * signature tables the batch cascade maintains — the ledger pattern).
  * The stream side computes each arriving doc's signature PER ROW with
  * array higher-order functions: no shuffle, no state, no window — a
  * row in, band keys out — then a stream-static equijoin against the
  * base band keys yields candidates, and a per-row exact
  * `array_intersect` Jaccard verifies them. The only stateful operator
  * is the final watermark-bounded dedup (a doc matching a base doc in
  * several bands must emit once), so executor state is O(pairs inside
  * the watermark), never O(corpus).
  *
  * HOF signatures are CodegenFallback (interpreted) — acceptable here
  * because the stream side touches each arriving doc exactly once;
  * the base side, which at 100 TB dominates, stays on the codegen'd
  * relational path. The per-row forms MUST reproduce the relational
  * hash composition bit-for-bit or band keys never collide across the
  * two pipelines; [[rowSignature]]/[[rowBandStructs]] mirror
  * `minHashSignatures`/`bandKeys` exactly (parity is spec-pinned).
  */
object StreamingIncrementalDedup {

  /** Per-row twin of [[TextPipeline.minHashSignatures]]: the same
    * composition — `h = xxhash64(s)`, then `m_i = min xxhash64(h, i)`
    * — expressed over one row's shingle array instead of a grouped
    * aggregate, so both produce identical signatures for the same
    * document.
    */
  def rowSignature(shingles: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingles, s => xxhash64(xxhash64(s), lit(i))))
    }: _*)

  /** Per-row twin of [[TextPipeline.bandKeys]]: bkey is the multi-arg
    * xxhash64 over the band's signature components, exactly as the
    * relational form computes it from its wide columns.
    */
  def rowBandStructs(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val comps = (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(comps: _*).as("bkey"))
    }: _*)

  /** @param base   static (doc_id, text) corpus frame
    * @param stream streaming (doc_id, text, ts) frame — `ts` is the
    *               event-time column the result's dedup watermark rides
    * @return append-mode streaming frame of
    *         (incoming_doc, base_doc, jac, ts), one row per cross pair
    *         at or above `threshold`
    */
  def crossDupStream(
      base: DataFrame,
      stream: DataFrame,
      lateness: String = "10 minutes",
      shingleK: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
  ): DataFrame = {
    require(bands * rowsPerBand <= k)
    // Static side, materialized once (eager checkpoint = computed at
    // plan time, re-read as blocks by every micro-batch).
    val shB = TextPipeline.withDocCounts(TextPipeline.docShingles(base, shingleK))
      .localCheckpoint(eager = true)
    val bandB = TextPipeline
      .bandKeys(TextPipeline.minHashSignatures(shB.select("doc_id", "s"), k), bands, rowsPerBand)
      .select(col("doc_id").as("base_doc"), col("band"), col("bkey"))
      .localCheckpoint(eager = true)
    val baseSets = shB
      .groupBy(col("doc_id").as("base_doc"))
      .agg(collect_set(col("s")).as("base_set"))
      .localCheckpoint(eager = true)

    val arrivals = stream
      .withColumn("shing", array_distinct(TF.wordShingles(col("text"), shingleK)))
      .where(size(col("shing")) > 0)
      .withColumn("sig", rowSignature(col("shing"), k))
      .select(
        col("doc_id").as("incoming_doc"), col("ts"), col("shing"),
        explode(rowBandStructs(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(
        col("incoming_doc"), col("ts"), col("shing"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))

    arrivals
      .join(bandB, Seq("band", "bkey")) // stream-static equijoin
      .join(baseSets, Seq("base_doc"))
      .withColumn("common", size(array_intersect(col("shing"), col("base_set"))))
      .withColumn("jac",
        col("common").cast("double") /
          (size(col("shing")) + size(col("base_set")) - col("common")))
      .where(col("jac") >= threshold)
      .select(col("incoming_doc"), col("base_doc"), col("jac"), col("ts"))
      // one emission per cross pair even when several bands collide;
      // state for this dedup expires with the watermark
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("incoming_doc", "base_doc")
  }
}
