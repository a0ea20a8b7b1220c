package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int): Seq[MediaRecord] =
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      MediaRecord(i.toLong, kind, if (kind == "image") "png" else "bin",
        width = 0, height = 0,
        bytes = Array.tabulate(64 + i)(j => ((i * 31 + j) % 256).toByte))
    }

  test("decodeFeatures: deterministic stub, stable schema, one row per media") {
    val ds = spark.createDataset(fixture(30)).repartition(4)
    val out = decodeFeatures(ds, () => MediaDecoder.deterministicStub(8))
    val rows = out.collect()
    assert(rows.length == 30)
    assert(rows.forall(r => r.embedding.length == 8))
    assert(rows.forall(r => r.decoded_width >= 16 && r.decoded_height >= 16))
    // determinism: same input → identical embeddings across runs
    val again = decodeFeatures(ds, () => MediaDecoder.deterministicStub(8)).collect()
    assert(rows.sortBy(_.media_id).map(_.embedding.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.embedding.toSeq).toSeq)
  }

  test("decoder is instantiated once per partition, not once per row") {
    val inits: LongAccumulator = spark.sparkContext.longAccumulator("decoder_inits")
    val ds = spark.createDataset(fixture(40)).repartition(4)
    decodeFeatures(ds, { () =>
      inits.add(1)
      MediaDecoder.deterministicStub(4)
    }).collect()
    assert(inits.value == 4, s"expected 4 decoder inits (one per partition), got ${inits.value}")
  }

  test("sampleFrames: only video rows fan out, stride respected") {
    val ds = spark.createDataset(fixture(30))
    val frames = sampleFrames(ds, everyN = 4, () => MediaDecoder.deterministicStub(4))
    val byKind = frames.join(ds.toDF().select(col("media_id"), col("kind")), "media_id")
      .groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(byKind.keySet == Set("video"))
    // stride: frame indices are multiples of 4
    assert(frames.select("frame_idx").as[Int].collect().forall(_ % 4 == 0))
  }

  test("byByteBudget partitions by payload volume") {
    val ds = spark.createDataset(fixture(60)).toDF()
    val repart = byByteBudget(ds, bytesPerPartition = 1000)
    assert(repart.rdd.getNumPartitions > 1)
    val stats = mediaStats(ds)
    assert(stats.count() == 3) // image/png, audio/bin, video/bin
  }

  test("resizeImages bounds image dims, passes non-images through, deterministic") {
    val ds = spark.createDataset(fixture(30))
    val resized = resizeImages(ds, maxDim = 64, () => MediaDecoder.deterministicStub(4))
    val rows = resized.collect()
    assert(rows.length == 30)
    val images = rows.filter(_.kind == "image")
    assert(images.nonEmpty && images.forall(r => math.max(r.width, r.height) <= 64))
    // non-image rows untouched (width still the source-declared 0)
    assert(rows.filter(_.kind != "image").forall(r => r.width == 0))
    val again = resizeImages(ds, 64, () => MediaDecoder.deterministicStub(4)).collect()
    assert(rows.map(r => (r.media_id, r.width, r.height, r.bytes.length)).toSeq ==
      again.map(r => (r.media_id, r.width, r.height, r.bytes.length)).toSeq)
  }

  test("real decoder is an explicit stub") {
    intercept[NotImplementedError](MediaDecoder.real)
  }

  test("metadata-only queries prune the binary column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    spark.createDataset(fixture(30)).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).groupBy("kind").count()
    val scanSchema = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanSchema.contains("kind"))
    assert(!scanSchema.contains("bytes"), "binary column must not be read for metadata-only query")
  }
}
