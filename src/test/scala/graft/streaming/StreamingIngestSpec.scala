package graft.streaming

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sink.RawSink

case class IngestRow(
    source: String, customer_id: String, query_name: String,
    logical_date: Date, metric: Long, payload: String)

/** The streaming→sink boundary must deliver effectively-once: every
  * micro-batch becomes one sealed run, a replayed batch re-seals
  * nothing it already sealed, and a partially-sealed crash resumes
  * with only the missing partitions.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def row(date: String, customer: String, i: Long) =
    IngestRow("google_ads", customer, "campaign_daily", Date.valueOf(date), i, s"v$i")

  test("each micro-batch lands as its own sealed run; reads back exactly once in run order") {
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("singest").toString
    val sink = new RawSink(spark, root)
    val in = MemoryStream[IngestRow]
    val q = StreamingIngest.toRawSink(in.toDF(), sink)
      .option("checkpointLocation", Files.createTempDirectory("singestck").toString)
      .start()
    in.addData(row("2024-01-01", "c1", 1), row("2024-01-01", "c1", 2))
    q.processAllAvailable()
    in.addData(row("2024-01-01", "c1", 3), row("2024-01-02", "c2", 4))
    q.processAllAvailable()
    q.stop()

    val runs = sink.sealedRuns().select("run_id").distinct()
      .as[String].collect().sorted.toSeq
    assert(runs.size == 2 && runs == runs.sorted,
      s"one sealed run per batch, lexicographic = batch order: $runs")
    assert(sink.readAll().count() == 4)
    assert(sink.readAll().agg(sum("metric")).head().getLong(0) == 10L)
  }

  test("batch replay is effectively-once: sealed partitions skip, nothing duplicates") {
    val root = Files.createTempDirectory("singestr").toString
    val sink = new RawSink(spark, root)
    val batch: DataFrame = Seq(
      row("2024-01-01", "c1", 1), row("2024-01-01", "c1", 2), row("2024-01-02", "c2", 3),
    ).toDF()

    StreamingIngest.ingestBatch(sink, "stream")(batch, 7L)
    assert(sink.readAll().count() == 3)
    // Spark re-invokes foreachBatch with the SAME batchId after a
    // restart — must be a no-op, not a K3 throw, not a duplicate
    StreamingIngest.ingestBatch(sink, "stream")(batch, 7L)
    assert(sink.readAll().count() == 3, "replayed batch must not duplicate rows")
    // a genuinely new batch still lands
    StreamingIngest.ingestBatch(sink, "stream")(
      Seq(row("2024-01-03", "c1", 9)).toDF(), 8L)
    assert(sink.readAll().count() == 4)
  }

  test("partial-seal crash resumes: only unsealed partitions are rewritten") {
    val root = Files.createTempDirectory("singestp").toString
    val sink = new RawSink(spark, root)
    val full: DataFrame = Seq(
      row("2024-01-01", "c1", 1), row("2024-01-02", "c2", 2),
    ).toDF()
    // simulate a crash that sealed only the c1 partition of batch 3
    sink.writeRun(full.where(col("customer_id") === "c1"), "stream_000000000003")
    assert(sink.readAll().count() == 1)
    // the replay must write ONLY the c2 remainder (writing c1 again
    // would K3-throw; skipping everything would lose c2)
    StreamingIngest.ingestBatch(sink, "stream")(full, 3L)
    assert(sink.readAll().count() == 2)
    assert(sink.readAll().select("customer_id").distinct().count() == 2)
  }
}
