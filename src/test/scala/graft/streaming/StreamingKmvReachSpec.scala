package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class ReachEvent(event_type: String, user_id: Long)

/** Stream-equals-batch EXACTLY: the KMV state fold is the bottom-k
  * merge, so any arrival order and any micro-batch slicing must land
  * on bit-identical estimates to batch q119 over the same rows.
  */
class StreamingKmvReachSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events: Seq[ReachEvent] =
    graft.ops.Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"))
      .as[ReachEvent].collect().toSeq

  private lazy val batchTruth: Map[String, Long] =
    graft.ops.Registry.byName("q119_sketch_reach").run(spark, sfDir)
      .select("event_type", "est_users")
      .as[(String, Long)].collect().toMap

  /** Drive the reach stream over `slices` micro-batches; return the
    * LAST emitted estimate per group (Update-mode semantics).
    */
  private def drive(slices: Seq[Seq[ReachEvent]], name: String): Map[String, (Long, Int)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ReachEvent]
    val out = StreamingKmvReach.reachStream(in.toDF())
    val q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
    slices.foreach { s => if (s.nonEmpty) { in.addData(s); q.processAllAvailable() } }
    q.stop()
    // memory sink in update mode appends each trigger's updates; the
    // final state is each group's last emission
    spark.table(name)
      .withColumn("seq", monotonically_increasing_id())
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type").orderBy(desc("seq"))))
      .where(col("rn") === 1)
      .select(col("event_type"), col("est_users"), col("state_size"))
      .as[(String, Long, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
  }

  test("stream reach equals batch q119 exactly — in-order arrival, 3 slices") {
    val got = drive(events.grouped((events.size + 2) / 3).toSeq, "kmv_inorder_t")
    assert(got.view.mapValues(_._1).toMap == batchTruth,
      s"stream estimates must be bit-identical to batch q119: $got vs $batchTruth")
  }

  test("stream reach is order- and slicing-insensitive (KMV fold = bottom-k merge)") {
    val rnd = new scala.util.Random(11)
    val scrambled = rnd.shuffle(events)
    val got7 = drive(scrambled.grouped((scrambled.size + 6) / 7).toSeq, "kmv_scram7_t")
    assert(got7.view.mapValues(_._1).toMap == batchTruth)
    val got1 = drive(Seq(events.reverse), "kmv_rev1_t")
    assert(got1.view.mapValues(_._1).toMap == batchTruth)
  }

  test("replayed arrivals are idempotent and state stays k-bounded") {
    val slice = events.take(500)
    val got = drive(Seq(slice, slice, events.drop(500), slice), "kmv_replay_t")
    assert(got.view.mapValues(_._1).toMap == batchTruth,
      "re-delivered events must not move any estimate")
    got.values.foreach { case (_, size) =>
      assert(size <= 256, s"state must never exceed k=256 hashes, saw $size")
    }
  }

  test("fold/estimate unit semantics: exact below k, k-th-hash division at k") {
    import StreamingKmvReach._
    val below = fold(None, Iterator(30L, 10L, 20L, 10L), k = 8)
    assert(below.ks == List(10L, 20L, 30L), "dedupe + sort")
    assert(estimate(below.ks, 8) == 3L, "below k the estimate IS the distinct count")
    val at = fold(Some(below), Iterator(5L, 40L, 50L, 60L, 70L, 80L, 90L), k = 8)
    assert(at.ks.size == 8 && at.ks.head == 5L && at.ks.last == 70L,
      s"bottom-k must keep the 8 smallest: ${at.ks}")
    assert(estimate(at.ks, 8) == (7L << 48) / 70L)
    // merge identity: fold(all at once) == fold(fold(first), rest)
    val oneShot = fold(None, (below.ks ++ at.ks).iterator, k = 8)
    assert(oneShot == at, "bottom-k of union must equal incremental fold")
  }
}
