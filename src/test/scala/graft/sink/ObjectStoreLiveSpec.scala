package graft.sink

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.PartitionKey

/** Object-store suite for the K1/K2/K3 claims — the analog of the
  * reference's marker-gated MinIO integration tests
  * (gads-etl `tests/integration/test_raw_sink_object_minio.py:11-62`):
  * round-trip, run listing, overwrite refusal, and the conditional-PUT
  * seal claim against an S3 API.
  *
  * BACKEND SELECTION (round 7 — so the suite EXECUTES everywhere
  * instead of perpetually canceling in offline environments): when the
  * MinIO env vars are set AND the s3a connector (hadoop-aws) is on the
  * classpath, every test runs LIVE against that endpoint; otherwise it
  * runs against the in-process [[FakeS3FileSystem]], which models the
  * exact object-store semantics the seal claim's correctness argument
  * rests on — whole-object visibility at close, close-time
  * If-None-Match conditional create (so true PUT races are
  * exercisable), non-atomic copy+delete rename, no appends, strong
  * list-after-write. Point it at a real endpoint with:
  *
  * {{{
  * MINIO_ENDPOINT_URL=http://localhost:9000 MINIO_BUCKET=graft-tests \
  * MINIO_ACCESS_KEY_ID=... MINIO_SECRET_ACCESS_KEY=... sbt \
  *   "testOnly graft.sink.ObjectStoreLiveSpec"
  * }}}
  *
  * `fs.s3a.create.conditional.enabled` is set so stores honoring
  * `If-None-Match` make the seal claim atomic AT THE STORE (the
  * production configuration the seal-writer scaladoc names); stores
  * without it exercise the documented HEAD-then-PUT degradation.
  */
class ObjectStoreLiveSpec extends SparkSpec {
  import spark.implicits._

  private def env(k: String) = sys.env.get(k).filter(_.nonEmpty)
  private lazy val endpoint = env("MINIO_ENDPOINT_URL")
  private lazy val bucket = env("MINIO_BUCKET")
  private lazy val accessKey = env("MINIO_ACCESS_KEY_ID")
  private lazy val secretKey = env("MINIO_SECRET_ACCESS_KEY")
  private lazy val prefix = env("MINIO_PREFIX").getOrElse("raw-tests")

  private lazy val envConfigured =
    Seq(endpoint, bucket, accessKey, secretKey).forall(_.isDefined)
  private lazy val connectorPresent =
    scala.util.Try(Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem")).isSuccess
  private lazy val live = envConfigured && connectorPresent

  /** Per-test isolated root: live endpoint when configured, else the
    * in-process S3-semantics fake (registered as the `s3a` scheme —
    * unambiguous precisely because hadoop-aws is absent offline).
    */
  private def withStoreRoot(testName: String)(body: String => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = if (live) {
      conf.set("fs.s3a.endpoint", endpoint.get)
      conf.set("fs.s3a.access.key", accessKey.get)
      conf.set("fs.s3a.secret.key", secretKey.get)
      conf.set("fs.s3a.path.style.access", "true")
      conf.set("fs.s3a.connection.ssl.enabled",
        String.valueOf(endpoint.get.startsWith("https")))
      conf.set("fs.s3a.create.conditional.enabled", "true")
      s"s3a://${bucket.get}/$prefix/$testName-${java.util.UUID.randomUUID().toString.take(8)}"
    } else {
      conf.set("fs.s3a.impl", classOf[FakeS3FileSystem].getName)
      conf.set("fs.s3a.impl.disable.cache", "true")
      val local = java.nio.file.Files.createTempDirectory(s"fakes3-$testName").toString
      s"s3a:$local"
    }
    try body(root)
    finally {
      val p = new org.apache.hadoop.fs.Path(root)
      scala.util.Try(p.getFileSystem(conf).delete(p, true))
    }
  }

  private val runKey =
    PartitionKey("google_ads", "cust", "campaign", Date.valueOf("2024-06-01"))
  private def payload(n: Int) =
    (1 to n).map(i => ("google_ads", "cust", "campaign", Date.valueOf("2024-06-01"),
      s"row$i"))
      .toDF("source", "customer_id", "query_name", "logical_date", "foo")

  test("store round trip: write, seal, read back rows + metadata, list runs") {
    withStoreRoot("roundtrip") { root =>
      val sink = new RawSink(spark, root)
      val runId = java.util.UUID.randomUUID().toString
      val seals = sink.writeRun(payload(3), runId)
      assert(seals.map(s => (s.key, s.recordCount)) == Seq((runKey, 3L)))
      assert(sink.isSealed(runKey, runId), "seal object must exist on the store")
      val sealJson = sink.readSeal(runKey, runId).get
      assert(sealJson.contains("\"record_count\":3"))
      assert(sink.readAll().where(col("run_id") === runId).count() == 3)
      assert(sink.listRuns(runKey).contains(runId))
    }
  }

  test("store overwrite refusal: a second write into a sealed (key, run) throws") {
    withStoreRoot("refusal") { root =>
      val sink = new RawSink(spark, root)
      val runId = java.util.UUID.randomUUID().toString
      sink.writeRun(payload(2), runId)
      val e = intercept[IllegalStateException](sink.writeRun(payload(2), runId))
      assert(e.getMessage.contains("refusing overwrite"))
      // the original run is untouched by the refused attempt
      assert(sink.readAll().where(col("run_id") === runId).count() == 2)
    }
  }

  test("store conditional-PUT seal claim: retry is idempotent, foreign seal conflicts") {
    withStoreRoot("claim") { root =>
      val conf = spark.sparkContext.hadoopConfiguration
      val seal = RawSink.SealRow(
        "google_ads", "cust", "campaign", Date.valueOf("2024-06-01"), 7L, "r1", "v1")
      val dir = RawSink.runDirPath(root, seal)
      dir.getFileSystem(conf).mkdirs(dir)
      RawSink.writeSealFile(conf, root, seal)
      // identical re-claim (task retry): must not throw
      RawSink.writeSealFile(conf, root, seal)
      // differing content at the same path: the claim must fail loudly
      val foreign = seal.copy(record_count = 9L)
      val e = intercept[IllegalStateException](RawSink.writeSealFile(conf, root, foreign))
      assert(e.getMessage.contains("seal conflict"))
    }
  }

  test("store PUT visibility: an unclosed seal write materializes nothing") {
    // The no-partial-seal argument: a writer that dies mid-PUT leaves
    // NOTHING on an object store (visibility is at close), so readers
    // can never observe a truncated seal. Exercised by opening the
    // exact seal path, writing bytes, and crashing before close.
    withStoreRoot("visibility") { root =>
      val conf = spark.sparkContext.hadoopConfiguration
      val seal = RawSink.SealRow(
        "google_ads", "cust", "campaign", Date.valueOf("2024-06-01"), 7L, "r1", "v1")
      val dir = RawSink.runDirPath(root, seal)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val sealPath = new org.apache.hadoop.fs.Path(dir, "metadata.json")
      val out = fs.create(sealPath, false)
      out.write("""{"record_count":7,"truncated""".getBytes("UTF-8"))
      // no close — the writer "dies" here
      assert(!fs.exists(sealPath),
        "a mid-flight PUT must be invisible: object stores materialize whole objects at close only")
      out.close()
      assert(fs.exists(sealPath), "the completed PUT must be visible at close")
    }
  }

  test("store conditional-PUT race: two concurrent claimants, exactly one wins, winner's bytes survive") {
    // The TOCTOU scenario the conditional PUT exists for: both writers
    // pass any HEAD check and upload concurrently; the store must
    // serialize the claim at close. The seal writer then routes the
    // loser through the content check — differing content throws.
    withStoreRoot("race") { root =>
      val conf = spark.sparkContext.hadoopConfiguration
      val sealA = RawSink.SealRow(
        "google_ads", "cust", "campaign", Date.valueOf("2024-06-01"), 7L, "r1", "v1")
      val sealB = sealA.copy(record_count = 9L) // rival claim, different bytes
      val dir = RawSink.runDirPath(root, sealA)
      dir.getFileSystem(conf).mkdirs(dir)
      val startGate = new java.util.concurrent.CountDownLatch(1)
      val results = new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()
      def claimant(name: String, s: RawSink.SealRow): Thread = {
        val t = new Thread(() => {
          startGate.await()
          val r =
            try { RawSink.writeSealFile(conf, root, s); None }
            catch { case e: IllegalStateException => Some(e.getMessage) }
          results.put(name, r)
        })
        t.start(); t
      }
      val (ta, tb) = (claimant("a", sealA), claimant("b", sealB))
      startGate.countDown()
      ta.join(30000); tb.join(30000)
      val outcomes = Seq(results.get("a"), results.get("b"))
      assert(outcomes.count(_.isEmpty) == 1,
        s"exactly one claim must win, got $outcomes")
      assert(outcomes.flatten.forall(_.contains("seal conflict")),
        s"the loser must surface the conflict loudly, got $outcomes")
      // the surviving seal is the winner's, intact
      val winnerCount = if (results.get("a").isEmpty) 7L else 9L
      val surviving = RawSink.readSealRow(conf, root,
        RawSink.Tuple5RowCase("google_ads", "cust", "campaign",
          Date.valueOf("2024-06-01"), "r1"))
      assert(surviving.record_count == winnerCount,
        "the winning claim's bytes must survive the race untouched")
    }
  }
}
