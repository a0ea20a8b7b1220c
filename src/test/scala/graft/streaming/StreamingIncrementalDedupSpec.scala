package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.TextPipeline

case class Arriving(doc_id: Long, text: String, ts: Timestamp)

class StreamingIncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("per-row signature and band keys reproduce the relational pipeline bit-for-bit") {
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(50)
    val k = 64
    // relational: grouped aggregate signature → band keys
    val rel = TextPipeline
      .bandKeys(TextPipeline.minHashSignatures(TextPipeline.docShingles(docs, 3), k), 16, 4)
      .select("doc_id", "band", "bkey")
      .as[(Long, Int, Long)].collect().toSet
    // per-row: HOF signature → band structs
    val row = docs
      .withColumn("shing", array_distinct(graft.functions.TextFunctions.wordShingles(col("text"), 3)))
      .where(size(col("shing")) > 0)
      .withColumn("sig", StreamingIncrementalDedup.rowSignature(col("shing"), k))
      .select(col("doc_id"), explode(StreamingIncrementalDedup.rowBandStructs(col("sig"), 16, 4)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bkey"))
      .as[(Long, Int, Long)].collect().toSet
    assert(rel == row)
  }

  test("streaming arrivals match the batch incrementalCascade on the same split") {
    val docs = graft.ops.Tables.documents(spark, sfDir).select("doc_id", "text")
    val isInc = substring(md5(concat(lit("graft-batch:"), col("doc_id").cast("string"))), 1, 2) >= "c0"
    val base = docs.where(!isInc)
    val incoming = docs.where(isInc)

    val want = TextPipeline.incrementalCascade(base, incoming)
      .select(col("incoming_doc"), col("base_doc"), round(col("jac"), 4))
      .as[(Long, Long, Double)].collect().toSet

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Arriving]
    val out = StreamingIncrementalDedup.crossDupStream(base, in.toDF())
    val q = out.writeStream.format("memory").queryName("incdedup_t").outputMode("append").start()
    // feed the incoming docs across two micro-batches
    val rows = incoming.as[(Long, String)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    in.addData(b1.map { case (id, t) => Arriving(id, t, ts("2024-01-01 10:00:00")) }.toSeq)
    q.processAllAvailable()
    in.addData(b2.map { case (id, t) => Arriving(id, t, ts("2024-01-01 10:01:00")) }.toSeq)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("incdedup_t")
      .select(col("incoming_doc"), col("base_doc"), round(col("jac"), 4))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("persisted-table base state matches the from-corpus path (the long-lived-stream form)") {
    val docs = graft.ops.Tables.documents(spark, sfDir).select("doc_id", "text").limit(120)
    val isInc = substring(md5(concat(lit("graft-batch:"), col("doc_id").cast("string"))), 1, 2) >= "c0"
    val base = docs.where(!isInc)
    val incoming = docs.where(isInc).as[(Long, String)].collect()

    // persist the batch cascade's signature state to RELIABLE storage,
    // then run the stream off the tables — no localCheckpoint lifetime
    val st = StreamingIncrementalDedup.BaseState.fromCorpus(base)
    val dir = java.nio.file.Files.createTempDirectory("dedupstate").toString
    st.bandKeys.write.mode("overwrite").parquet(s"$dir/band_keys")
    st.shingleSets.write.mode("overwrite").parquet(s"$dir/shingle_sets")
    val fromTables = StreamingIncrementalDedup.BaseState.fromTables(
      spark.read.parquet(s"$dir/band_keys"), spark.read.parquet(s"$dir/shingle_sets"))

    implicit val ctx = spark.sqlContext
    def run(state: StreamingIncrementalDedup.BaseState, name: String): Set[(Long, Long, Double)] = {
      val in = MemoryStream[Arriving]
      val q = StreamingIncrementalDedup.crossDupStream(state, in.toDF())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      in.addData(incoming.map { case (id, t) => Arriving(id, t, ts("2024-01-01 10:00:00")) }.toSeq)
      q.processAllAvailable()
      q.stop()
      spark.table(name).select(col("incoming_doc"), col("base_doc"), round(col("jac"), 4))
        .as[(Long, Long, Double)].collect().toSet
    }
    assert(run(fromTables, "incdedup_tbl_t") == run(st, "incdedup_corp_t"))
  }

  test("fromTables validates the signature-table contract loudly") {
    val bad = Seq((1L, 2)).toDF("base_doc", "band") // bkey missing
    val sets = Seq((1L, Seq("a b c"))).toDF("base_doc", "base_set")
    intercept[IllegalArgumentException](
      StreamingIncrementalDedup.BaseState.fromTables(bad, sets))
    intercept[IllegalArgumentException](
      StreamingIncrementalDedup.BaseState.fromTables(
        Seq((1L, 2, 3L)).toDF("base_doc", "band", "bkey"),
        sets.drop("base_set")))
  }

  test("a doc colliding in several bands emits exactly once") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val base = Seq((1L, shared)).toDF("doc_id", "text")
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Arriving]
    val out = StreamingIncrementalDedup.crossDupStream(base, in.toDF())
    val q = out.writeStream.format("memory").queryName("incdedup_once_t").outputMode("append").start()
    // identical text ⇒ identical signature ⇒ collides in ALL 16 bands
    in.addData(Arriving(10L, shared, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("incdedup_once_t").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Double]("jac") == 1.0)
  }
}
