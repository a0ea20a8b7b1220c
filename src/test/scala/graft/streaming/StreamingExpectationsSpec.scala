package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Expectations

case class GateRow(k: Long, tag: String, v: java.lang.Double)

/** The streaming expectations gate: per-batch verdicts from the SAME
  * rule set the batch pipeline gates on, sum-decomposable parity with
  * batch evaluation, loud rejection of rules streaming can't honor.
  */
class StreamingExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Expectations.NotNull("tag_present", "tag"),
    Expectations.Predicate("v_positive", col("v") > 0),
    Expectations.InSet("tag_domain", "tag", Seq("a", "b")),
  )

  test("per-batch verdicts land per batch; violation counts sum to the batch-mode evaluation") {
    implicit val ctx = spark.sqlContext
    val out = Files.createTempDirectory("sexp").toString + "/results"
    val in = MemoryStream[GateRow]
    val q = StreamingExpectations.attach(
      in.toDF(), rules, out, Files.createTempDirectory("sexpck").toString).start()
    // batch 0: clean; batch 1: one null tag + one negative; batch 2: domain break
    in.addData(GateRow(1, "a", 1.0), GateRow(2, "b", 2.0))
    q.processAllAvailable()
    in.addData(GateRow(3, null, 3.0), GateRow(4, "a", -1.0))
    q.processAllAvailable()
    in.addData(GateRow(5, "z", 5.0))
    q.processAllAvailable()
    q.stop()

    val res = StreamingExpectations.results(spark, out)
    val byBatch = res.collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("rule")) ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass"))).toMap
    assert(byBatch((0L, "tag_present")) == ((0L, true)))
    assert(byBatch((1L, "tag_present")) == ((1L, false)))
    assert(byBatch((1L, "v_positive")) == ((1L, false)))
    // batch 1's null tag also breaks the domain rule (NULL ∉ {a, b})
    assert(byBatch((1L, "tag_domain")) == ((1L, false)))
    assert(byBatch((2L, "tag_domain")) == ((1L, false)))

    // decomposability parity: per-rule streamed sums == batch evaluate on the union
    val streamedSums = res.groupBy("rule").agg(sum("n_violations").as("nv"))
      .as[(String, Long)].collect().toMap
    val all = Seq(
      GateRow(1, "a", 1.0), GateRow(2, "b", 2.0), GateRow(3, null, 3.0),
      GateRow(4, "a", -1.0), GateRow(5, "z", 5.0)).toDF()
    val batchMode = Expectations.evaluate(all, rules)
      .select("rule", "n_violations").as[(String, Long)].collect().toMap
    assert(streamedSums == batchMode,
      s"streamed per-batch sums must equal batch-mode evaluation: $streamedSums vs $batchMode")
  }

  test("non-decomposable rules are rejected loudly at attach time") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[GateRow]
    val e = intercept[IllegalArgumentException] {
      StreamingExpectations.attach(
        in.toDF(),
        Seq(Expectations.Unique("k_unique", Seq("k"))),
        "/tmp/unused", "/tmp/unused_ck")
    }
    assert(e.getMessage.contains("k_unique"))
  }

  test("gateBatch replay appends to the raw log; results() absorbs it to one verdict per (batch_id, rule)") {
    val out = Files.createTempDirectory("sexpr").toString + "/results"
    val df = Seq(GateRow(1, "a", 1.0)).toDF()
    StreamingExpectations.gateBatch(rules, out)(df, 3L)
    StreamingExpectations.gateBatch(rules, out)(df, 3L)
    // the raw append log keeps both attempts (the audit trail)...
    assert(spark.read.parquet(out).where(col("batch_id") === 3L).count() == 2L * rules.size)
    // ...and the reader contract is exactly one verdict per (batch, rule)
    val res = StreamingExpectations.results(spark, out)
    assert(res.count() == rules.size.toLong)
    assert(res.collect().forall(_.getAs[Boolean]("pass")))
  }
}
