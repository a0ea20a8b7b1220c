package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class FreqEvent(event_type: String, user_id: Long)

/** Stream-equals-batch EXACTLY: CMS counters ADD, addition commutes
  * and associates, so any arrival order and any micro-batch slicing
  * must land on estimates bit-identical to the batch CMS built over
  * the same delivered multiset. Unlike the KMV twin, replay is NOT
  * idempotent — counters count duplicates — so the replay test pins
  * multiset semantics (stream over events++slice ≡ batch over
  * events++slice), the honest at-least-once contract of a counting
  * sketch.
  */
class StreamingCmsFreqSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 1024

  private lazy val events: Seq[FreqEvent] =
    graft.ops.Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"))
      .as[FreqEvent].collect().toSeq

  private lazy val probes: Seq[Long] =
    events.map(_.user_id).distinct.sorted.take(4)

  /** Batch CMS estimates for the probes over an explicit multiset —
    * the same counter build as q196's (shared cmsBucket), min over d.
    */
  private def batchTruth(rows: Seq[FreqEvent]): Map[(String, Long), Long] = {
    val ev = rows.toDF("event_type", "user_id")
    val cells = (0 until D).map(r =>
      struct(lit(r.toLong).as("d"), graft.ops.SketchQueries.cmsBucket(r, col("user_id")).as("b")))
    val counters = ev
      .select(col("event_type"), explode(array(cells: _*)).as("db"))
      .groupBy(col("event_type"), col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val probe = probes.toDF("user_id")
      .select(col("user_id"), explode(array(cells: _*)).as("db"))
      .select(col("user_id"), col("db.d").as("d"), col("db.b").as("b"))
    counters.join(probe, Seq("d", "b"))
      .groupBy("event_type", "user_id")
      .agg(min(col("cnt")).as("est_n"))
      .as[(String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
  }

  /** Drive the freq stream over `slices`; return each (group, probe)'s
    * LAST emitted estimate plus the group total (Update-mode semantics).
    */
  private def drive(slices: Seq[Seq[FreqEvent]], name: String): Map[(String, Long), (Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[FreqEvent]
    val out = StreamingCmsFreq.freqStream(in.toDF(), probes, D, W)
    val q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
    slices.foreach { s => if (s.nonEmpty) { in.addData(s); q.processAllAvailable() } }
    q.stop()
    spark.table(name)
      .withColumn("seq", monotonically_increasing_id())
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type", "user_id").orderBy(desc("seq"))))
      .where(col("rn") === 1)
      .select(col("event_type"), col("user_id"), col("est_n"), col("total_n"))
      .as[(String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
  }

  test("hash60 Scala replica is bit-identical to the Column portableHash60") {
    val samples = Seq("cms0|1", "cms3|987654321", "u|42", "", "ÅßΓ中文")
    val fromCol = samples.toDF("s")
      .select(graft.functions.MinHash.portableHash60(col("s")))
      .as[Long].collect().toSeq
    assert(samples.map(StreamingCmsFreq.hash60) == fromCol)
  }

  test("stream estimates equal the batch CMS exactly — in-order, scrambled, one-slice") {
    val truth = batchTruth(events)
    val inorder = drive(events.grouped((events.size + 2) / 3).toSeq, "cms_inorder_t")
    assert(inorder.view.mapValues(_._1).toMap == truth,
      "3-slice in-order stream must match the batch counters bit for bit")
    val rnd = new scala.util.Random(7)
    val scram = drive(rnd.shuffle(events).grouped((events.size + 6) / 7).toSeq, "cms_scram_t")
    assert(scram.view.mapValues(_._1).toMap == truth, "counter addition must commute")
    val one = drive(Seq(events.reverse), "cms_one_t")
    assert(one.view.mapValues(_._1).toMap == truth)
    // one-sided error: est ≥ exact for every probe, and total_n is the
    // group's delivered row count (the N of the ≤ N/w overshoot bound)
    val exact = events.groupBy(e => (e.event_type, e.user_id)).view.mapValues(_.size.toLong).toMap
    val perGroup = events.groupBy(_.event_type).view.mapValues(_.size.toLong).toMap
    inorder.foreach { case ((g, p), (est, total)) =>
      assert(est >= exact.getOrElse((g, p), 0L), s"CMS must never undercount ($g, $p)")
      assert(total == perGroup(g), s"total_n must count the group's delivered rows ($g)")
    }
  }

  test("replay pins multiset semantics: counting sketches count re-delivery") {
    val slice = events.take(400)
    val truth = batchTruth(events ++ slice)
    val got = drive(Seq(slice, events.drop(400), slice), "cms_replay_t")
    assert(got.view.mapValues(_._1).toMap == truth,
      "stream over events++slice must equal batch over events++slice")
  }

  test("fold/estimate unit semantics: per-row increments, min-over-d, state geometry fixed") {
    import StreamingCmsFreq._
    val bs1 = Seq(3, 7, 11, 13)
    val bs2 = Seq(3, 8, 11, 14) // collides with bs1 on rows 0 and 2
    val s1 = fold(None, Iterator(bs1, bs1, bs2), D, W)
    assert(s1.counters.length == D * W)
    assert(s1.counters(0 * W + 3) == 3L, "row-0 bucket 3 sees all three arrivals")
    assert(s1.counters(1 * W + 7) == 2L && s1.counters(1 * W + 8) == 1L)
    assert(estimate(s1.counters, bs1, W) == 2L, "min over d dodges the row-0/2 collisions")
    assert(estimate(s1.counters, bs2, W) == 1L)
    // fold is the CMS merge: incremental ≡ one-shot
    val inc = fold(Some(fold(None, Iterator(bs1), D, W)), Iterator(bs1, bs2), D, W)
    assert(inc.counters.toSeq == s1.counters.toSeq)
    // bucketsOf agrees with the driver-side hash it is built on
    assert(bucketsOf(42L, D, W.toLong) ==
      (0 until D).map(r => (hash60(s"cms$r|42") % W).toInt))
  }
}
