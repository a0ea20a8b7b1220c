package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingCdc._

class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // the q194 spec fixture: tombstone, re-materialization, bare-update keys
  private val fixture = Seq(
    CdcEvent(1L, 1L, "signup", ts("2024-01-01 00:00:01"), 1.0),
    CdcEvent(1L, 2L, "click", ts("2024-01-01 00:00:02"), 2.0),
    CdcEvent(2L, 3L, "signup", ts("2024-01-01 00:00:01"), 3.0),
    CdcEvent(2L, 4L, "view", ts("2024-01-01 00:00:02"), 4.0),
    CdcEvent(2L, 5L, "error", ts("2024-01-01 00:00:03"), 5.0),
    CdcEvent(3L, 6L, "signup", ts("2024-01-01 00:00:01"), 6.0),
    CdcEvent(3L, 7L, "error", ts("2024-01-01 00:00:02"), 7.0),
    CdcEvent(3L, 8L, "purchase", ts("2024-01-01 00:00:03"), 8.5),
    CdcEvent(4L, 9L, "error", ts("2024-01-01 00:00:01"), 9.0),
    CdcEvent(5L, 10L, "click", ts("2024-01-01 00:00:01"), 10.0),
  )

  /** Final snapshot = last emitted row per key across all updates. */
  private def runScrambled(batches: Seq[Seq[CdcEvent]], name: String): Map[Long, CdcRow] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[CdcEvent]
    val q = cdcStream(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(StreamingCdc.outputMode).start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // memory sink in update mode appends each update; the LAST row per
    // key is the maintained snapshot
    spark.table(name).as[CdcRow].collect()
      .zipWithIndex.groupBy(_._1.user_id)
      .map { case (k, rows) => k -> rows.maxBy(_._2)._1 }
  }

  test("streaming snapshot ≡ batch q194 on the same events, ANY arrival order") {
    val dir = java.nio.file.Files.createTempDirectory("cdcstream").toString
    fixture.toDS()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val batch = graft.ops.AnalyticQueries.q194.run(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap

    // in-order, reversed, and interleaved arrivals must all converge
    val orderings = Seq(
      Seq(fixture),
      Seq(fixture.reverse),
      Seq(fixture.drop(6), fixture.take(3), fixture.slice(3, 6)),
    )
    orderings.zipWithIndex.foreach { case (batches, i) =>
      val snap = runScrambled(batches, s"cdc_parity_$i")
      val survivors = snap.filter(!_._2.deleted)
      assert(survivors.keySet == batch.keySet,
        s"ordering $i: survivors ${survivors.keySet} vs batch ${batch.keySet}")
      survivors.foreach { case (k, row) =>
        val b = batch(k)
        assert(row.last_op == b.getAs[String]("last_op"), s"ordering $i key $k op")
        assert(row.last_ts_us == b.getAs[Long]("last_ts_us"), s"ordering $i key $k ts")
        assert(row.last_value == b.getAs[Double]("last_value"), s"ordering $i key $k value")
        assert(row.n_ops == b.getAs[Long]("n_ops"), s"ordering $i key $k n_ops")
        assert(row.n_deletes_replayed == b.getAs[Long]("n_deletes_replayed"),
          s"ordering $i key $k deletes")
      }
      // tombstoned keys surface as deleted=true retractions
      assert(snap.filter(_._2.deleted).keySet == Set(2L, 4L), s"ordering $i tombstones")
    }
  }

  test("fold is associative: incremental two-step fold ≡ one-shot fold") {
    val (a, b) = fixture.splitAt(4)
    val oneShot = StreamingCdc.fold(None, fixture.iterator)
    val twoStep = StreamingCdc.fold(Some(StreamingCdc.fold(None, a.iterator)), b.iterator)
    assert(oneShot == twoStep)
    val reversed = StreamingCdc.fold(None, fixture.reverse.iterator)
    assert(oneShot == reversed, "fold must be order-insensitive")
  }
}
