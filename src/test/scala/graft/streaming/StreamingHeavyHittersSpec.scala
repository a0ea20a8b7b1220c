package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StreamingHeavyHitters._

/** SpaceSaving guarantees on a replayed bounded stream: presence of
  * every key above the N/k threshold, one-sided error within each
  * entry's own bound, exactly-once window finalization, and shard
  * disjointness.
  */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600000L
  private val base = java.time.Instant.parse("2024-01-01T01:00:00Z")
  private def ts(offMs: Long) = java.sql.Timestamp.from(base.plusMillis(offMs))

  test("hot keys survive eviction pressure; estimates respect the SpaceSaving bounds") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyEvent]
    val q = heavyHitterStream(in.toDS(), k = 8, nBuckets = 1, windowMs = Hour,
      lateness = "1 minute")
      .writeStream.format("memory").queryName("hh_bounds").outputMode("append").start()
    // one window: hot×100, warm×30, 50 distinct cold singletons
    // N = 180, N/k = 22.5 → hot and warm MUST be reported
    val hot = (1 to 100).map(i => KeyEvent("hot", ts(i)))
    val warm = (1 to 30).map(i => KeyEvent("warm", ts(1000 + i)))
    val cold = (1 to 50).map(i => KeyEvent(s"cold$i", ts(2000 + i)))
    in.addData(hot ++ warm ++ cold: _*)
    q.processAllAvailable()
    assert(spark.table("hh_bounds").count() == 0, "window still open — nothing emits")
    in.addData(KeyEvent("later", ts(2 * Hour))) // advances the watermark past the window
    q.processAllAvailable()
    val out = spark.table("hh_bounds").as[HeavyHitter].collect()
    q.stop()
    assert(out.length == 8, "a full summary emits exactly k entries")
    val byKey = out.map(e => e.key -> e).toMap
    val truth = Map("hot" -> 100L, "warm" -> 30L) ++ (1 to 50).map(i => s"cold$i" -> 1L)
    assert(byKey.contains("hot") && byKey.contains("warm"),
      s"keys above N/k=22.5 must be present: ${out.map(_.key).toSeq}")
    out.foreach { e =>
      val t = truth(e.key)
      assert(e.est >= t && e.est - t <= e.err && e.err <= 180L / 8 + 1,
        s"${e.key}: est ${e.est} err ${e.err} true $t violates SpaceSaving bounds")
    }
    assert(byKey("hot").est == 100L && byKey("hot").err == 0L,
      "a never-evicted early key counts exactly")
  }

  test("windows finalize once; a closed window's late event is dropped, not double-counted") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyEvent]
    val q = heavyHitterStream(in.toDS(), k = 4, nBuckets = 1, windowMs = Hour,
      lateness = "1 minute")
      .writeStream.format("memory").queryName("hh_once").outputMode("append").start()
    in.addData(KeyEvent("a", ts(0)), KeyEvent("a", ts(1)), KeyEvent("b", ts(2)))
    in.addData(KeyEvent("w2", ts(2 * Hour))) // closes window 1
    q.processAllAvailable()
    val afterClose = spark.table("hh_once").as[HeavyHitter].collect()
      .filter(_.winStart == base.toEpochMilli / Hour * Hour)
    assert(afterClose.map(e => e.key -> e.est).toMap == Map("a" -> 2L, "b" -> 1L))
    // a late arrival for the CLOSED window must not re-emit or change it
    in.addData(KeyEvent("a", ts(3)))
    in.addData(KeyEvent("w3", ts(4 * Hour)))
    q.processAllAvailable()
    val again = spark.table("hh_once").as[HeavyHitter].collect()
      .filter(_.winStart == base.toEpochMilli / Hour * Hour)
    q.stop()
    assert(again.map(e => e.key -> e.est).toMap == Map("a" -> 2L, "b" -> 1L),
      "closed windows are immutable")
  }

  test("buckets shard the key space disjointly; union of summaries covers all shards") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyEvent]
    val q = heavyHitterStream(in.toDS(), k = 4, nBuckets = 4, windowMs = Hour,
      lateness = "1 minute")
      .writeStream.format("memory").queryName("hh_shard").outputMode("append").start()
    val keys = (1 to 40).map(i => s"k$i")
    in.addData(keys.flatMap(k => Seq.fill(3)(KeyEvent(k, ts(1)))): _*)
    in.addData(KeyEvent("later", ts(2 * Hour)))
    q.processAllAvailable()
    val out = spark.table("hh_shard").as[HeavyHitter].collect()
    q.stop()
    // every emitted key sits in its deterministic shard
    out.foreach(e => assert(e.bucket == bucketOf(e.key, 4)))
    // ≤ k entries per (bucket, window); no key appears in two shards
    out.groupBy(e => (e.bucket, e.winStart)).foreach { case (_, es) =>
      assert(es.length <= 4)
    }
    assert(out.map(_.key).distinct.length == out.map(_.key).length)
  }

  test("step: pure SpaceSaving update increments, inserts, and evicts the min entry") {
    val k = 2
    val s1 = step(Vector.empty, "a", k) // insert
    val s2 = step(s1, "a", k) // increment
    val s3 = step(s2, "b", k) // insert (room)
    val s4 = step(s3, "c", k) // evict b (min est 1) → c est 2 err 1
    assert(s4.map(e => (e.key, e.est, e.err)).toSet ==
      Set(("a", 2L, 0L), ("c", 2L, 1L)))
  }
}
