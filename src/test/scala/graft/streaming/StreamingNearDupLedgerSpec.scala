package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.TextPipeline

case class LedgerDoc(doc_id: Long, text: String, incoming: Boolean)

class StreamingNearDupLedgerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus: Seq[LedgerDoc] = {
    val isInc = substring(md5(concat(lit("graft-batch:"), col("doc_id").cast("string"))), 1, 2) >= "c0"
    graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), isInc.as("incoming"))
      .as[LedgerDoc].collect().toSeq
  }

  private lazy val batchTruth: Set[(Long, Long, Double)] = {
    val docs = graft.ops.Tables.documents(spark, sfDir).select("doc_id", "text")
    val ids = corpus.filter(_.incoming).map(_.doc_id).toSet
    val base = docs.where(!col("doc_id").isInCollection(ids))
    val incoming = docs.where(col("doc_id").isInCollection(ids))
    TextPipeline.incrementalCascade(base, incoming)
      .select(col("incoming_doc"), col("base_doc"), round(col("jac"), 4))
      .as[(Long, Long, Double)].collect().toSet
  }

  /** Drive the ledger stream over `slices` micro-batches and return the
    * emitted pairs. Pairs must be EXACTLY once, so the returned Seq's
    * length is part of the contract.
    */
  private def drive(slices: Seq[Seq[LedgerDoc]], name: String): Seq[(Long, Long, Double)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[LedgerDoc]
    val out = StreamingNearDupLedger.nearDupLedgerStream(in.toDF())
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    slices.foreach { s => if (s.nonEmpty) { in.addData(s); q.processAllAvailable() } }
    q.stop()
    spark.table(name)
      .select(col("incoming_doc"), col("base_doc"), round(col("jac"), 4))
      .as[(Long, Long, Double)].collect().toSeq
  }

  test("ledger stream reproduces batch q88 exactly — in-order arrival") {
    val (base, inc) = corpus.partition(!_.incoming)
    val got = drive(Seq(base, inc), "ndl_inorder_t")
    assert(got.toSet == batchTruth, "pair set must equal the batch cascade's")
    assert(got.length == got.distinct.length, "every pair exactly once")
  }

  test("ledger stream converges to the same set at scrambled arrival orders and slicings") {
    // seeded scrambles: incoming docs BEFORE the base docs they match,
    // interleavings, different batch counts — the state-store ledger
    // must make order irrelevant
    val rnd = new scala.util.Random(7)
    val scrambled = rnd.shuffle(corpus)
    val bySlices3 = scrambled.grouped((scrambled.size + 2) / 3).toSeq
    val got3 = drive(bySlices3, "ndl_scram3_t")
    assert(got3.toSet == batchTruth)
    assert(got3.length == got3.distinct.length, "every pair exactly once at any order")

    val reversed = corpus.reverse // all incoming arrive first
    val got2 = drive(Seq(reversed.take(200), reversed.slice(200, 380), reversed.drop(380)), "ndl_rev_t")
    assert(got2.toSet == batchTruth)
    assert(got2.length == got2.distinct.length)
  }

  test("a pair colliding in several bands emits exactly once (first-collision rule)") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      LedgerDoc(1L, shared, incoming = false),
      LedgerDoc(10L, shared, incoming = true), // identical ⇒ collides in ALL 16 bands
    )
    val got = drive(Seq(docs.take(1), docs.drop(1)), "ndl_once_t")
    assert(got == Seq((10L, 1L, 1.0)))
    // and in ONE micro-batch, same contract
    val got1 = drive(Seq(docs), "ndl_once1_t")
    assert(got1 == Seq((10L, 1L, 1.0)))
  }

  test("replayed arrivals are idempotent (a re-delivered doc adds no state and no pairs)") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val a = LedgerDoc(1L, shared, incoming = false)
    val b = LedgerDoc(10L, shared, incoming = true)
    val got = drive(Seq(Seq(a), Seq(b), Seq(b), Seq(a, b)), "ndl_replay_t")
    assert(got == Seq((10L, 1L, 1.0)), s"replay must not duplicate or re-pair: $got")
  }

  test("firstCollision and exactJaccard unit semantics") {
    import StreamingNearDupLedger._
    assert(firstCollision(Seq(1L, 2L, 3L), Seq(9L, 2L, 3L)) == 1)
    assert(firstCollision(Seq(1L, 2L), Seq(3L, 4L)) == -1)
    assert(exactJaccard(Seq("a", "b"), Seq("b", "c")) == 1.0 / 3.0)
    assert(exactJaccard(Seq.empty, Seq.empty) == 0.0)
  }
}
