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

  test("chunkAudio: hop-overlapping chunks cover the full duration, audio rows only") {
    val ds = spark.createDataset(fixture(30)).repartition(3)
    val chunks = chunkAudio(ds, chunkMs = 40, hopMs = 20, () => MediaDecoder.deterministicStub(4))
      .collect()
    val audio = fixture(30).filter(_.kind == "audio")
    assert(chunks.map(_.getAs[Long]("media_id")).toSet ==
      audio.map(_.media_id).toSet, "only audio rows chunk")
    audio.foreach { a =>
      val mine = chunks.filter(_.getAs[Long]("media_id") == a.media_id)
        .sortBy(_.getAs[Int]("chunk_idx"))
      val durMs = a.bytes.length // stub duration model
      assert(mine.length == math.ceil(durMs.toDouble / 20).toInt, s"chunk count for $durMs ms")
      // full coverage: chunk starts advance by hop; last chunk reaches the end
      mine.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Int]("start_ms") == i * 20)
        assert(c.getAs[Int]("dur_ms") ==
          math.min(c.getAs[Int]("start_ms") + 40, durMs) - c.getAs[Int]("start_ms"))
        assert(c.getAs[Array[Byte]]("chunk_bytes").length == c.getAs[Int]("dur_ms"))
      }
      assert(mine.last.getAs[Int]("start_ms") + mine.last.getAs[Int]("dur_ms") == durMs)
    }
    // empty/corrupt payload → zero chunks, not one phantom 0-ms chunk
    val empty = spark.createDataset(Seq(
      MediaRecord(99L, "audio", "bin", 0, 0, Array.empty[Byte])))
    assert(chunkAudio(empty, 40, 20, () => MediaDecoder.deterministicStub(4)).count() == 0)
    // consecutive 40/20 chunks overlap by 20ms — the framing property
    val full = chunks.filter(c => c.getAs[Int]("dur_ms") == 40)
      .groupBy(_.getAs[Long]("media_id"))
    full.foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getAs[Int]("start_ms"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Int]("start_ms") - a.getAs[Int]("start_ms") == 20)
        case _ => ()
      }
    }
  }

  test("sceneSplit: cuts exactly at signature jumps, scenes tile the frame range") {
    import MultimodalSpec.fixedFrames
    // 8 frames × 10 bytes: frames 0-2 dark (0x10), 3-5 bright (0xf0),
    // 6-7 dark again → three scenes [0,2][3,5][6,7]
    val bytes = Array.tabulate(80) { j =>
      val f = j / 10
      (if (f >= 3 && f <= 5) 0xf0 else 0x10).toByte
    }
    val vids = Seq(
      MediaRecord(1L, "video", "mp4", 0, 0, bytes),
      MediaRecord(2L, "video", "mp4", 0, 0, Array.fill(80)(0x40.toByte)), // flat: 1 scene
      MediaRecord(3L, "image", "png", 0, 0, bytes), // non-video: ignored
    )
    val out = sceneSplit(spark.createDataset(vids).repartition(2), 0.5, () => fixedFrames(8))
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("scene_id"),
        r.getAs[Long]("start_frame"), r.getAs[Long]("end_frame"), r.getAs[Long]("n_frames")))
    assert(out.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0L, 0L, 2L, 3L), (1L, 1L, 3L, 5L, 3L), (1L, 2L, 6L, 7L, 2L)),
      s"scene structure: ${out.toSeq}")
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 7L, 8L)), "flat video = one scene")
    assert(!out.exists(_._1 == 3L), "non-video rows must not reach scene analysis")
  }

  test("frameSignatures: one row per frame, signatures in [0,1], deterministic") {
    val vids = fixture(12).filter(_.kind == "video")
    val ds = spark.createDataset(vids).repartition(3)
    val sigs = frameSignatures(ds, () => MediaDecoder.deterministicStub(8)).collect()
    assert(sigs.nonEmpty)
    assert(sigs.forall { r =>
      val s = r.getAs[Double]("sig"); s >= 0.0 && s <= 1.0
    })
    val again = frameSignatures(ds, () => MediaDecoder.deterministicStub(8)).collect()
    assert(sigs.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(t => (t._1, t._2)).toSeq ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(t => (t._1, t._2)).toSeq)
  }

  test("mediaNearDupPairs: exact payload copies are found, all pairs verified above threshold") {
    // two byte-identical pairs planted among distinct payloads
    val base = fixture(24)
    val dup1 = base(1).copy(media_id = 100L) // audio copy
    val dup2 = base(3).copy(media_id = 101L) // image copy
    val ds = spark.createDataset(base ++ Seq(dup1, dup2)).repartition(3)
    val pairs = mediaNearDupPairs(ds, threshold = 0.999,
      () => MediaDecoder.deterministicStub(8)).collect()
    val found = pairs.map(r =>
      (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    // exactly the planted pairs: finds both copies, AND no false positive
    // among the 24 distinct payloads (a broken banding key matching
    // everything would fail here; cos >= threshold alone is tautological)
    assert(found == Set((1L, 100L), (3L, 101L)), s"expected only planted dups, got $found")
    assert(pairs.forall(_.getAs[Double]("cos") >= 0.999))
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

/** Serializable test decoders (defined outside the suite so closures
  * don't capture the non-serializable ScalaTest engine).
  */
object MultimodalSpec {

  /** Decoder reporting a fixed frame count — lets tests control the
    * frame→byte-slice mapping and therefore the scene structure.
    */
  def fixedFrames(n: Int): Multimodal.MediaDecoder = new Multimodal.MediaDecoder {
    def decode(kind: String, format: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) =
      (16, 16, n, Array.fill(8)(0f))
  }
}
