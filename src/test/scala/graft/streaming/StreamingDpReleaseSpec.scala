package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingDpRelease.TypedEvent

/** The streaming DP release: exactly-once finalized cells, noise
  * bit-identical to the batch formula (idempotent ε-spend), late
  * admissible events merged BEFORE the single release.
  */
class StreamingDpReleaseSpec extends SparkSpec {
  import spark.implicits._

  /** In-JVM recompute of DpNoise.twoSidedGeometric for a cell key. */
  private def noiseOf(tp: String, day: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"graft-dp-stream:$tp:$day".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def g(off: Int): Long = {
      val h = java.lang.Long.parseLong(hex.slice(off, off + 8), 16)
      math.floor(-math.log(1.0 - ((h.toDouble + 0.5) / 4294967296.0))).toLong
    }
    g(0) - g(8)
  }

  private def ts(s: String) = Timestamp.valueOf(s)
  private val day0 = 19723L // 2024-01-01

  private def runOnce(): Map[(String, Long), (Long, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TypedEvent]
    val name = s"dprel${System.nanoTime()}"
    val q = StreamingDpRelease.releaseStream(in.toDS(), "1 day")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    // day0: 3 views + 2 clicks; one more view arrives LATE but inside
    // the horizon (watermark still behind day0's end) — must merge.
    in.addData(
      TypedEvent("view", ts("2024-01-01 08:00:00")),
      TypedEvent("view", ts("2024-01-01 09:00:00")),
      TypedEvent("view", ts("2024-01-01 23:00:00")),
      TypedEvent("click", ts("2024-01-01 10:00:00")),
      TypedEvent("click", ts("2024-01-01 11:00:00")))
    q.processAllAvailable()
    in.addData(TypedEvent("view", ts("2024-01-01 06:00:00"))) // late, admissible
    q.processAllAvailable()
    // advance the watermark past day0 + lateness -> day0 finalizes once
    in.addData(TypedEvent("view", ts("2024-01-03 12:00:00")))
    q.processAllAvailable()
    val rows = spark.table(name).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        ((r.getAs[Long]("true_n"), r.getAs[Long]("noise"),
          r.getAs[Long]("released")))).toMap
    q.stop()
    rows
  }

  test("finalized cells carry the seeded noise; late admissible events merge pre-release") {
    val r = runOnce()
    // only day0 cells have finalized (the 01-03 event merely advanced the watermark)
    assert(r.keySet == Set(("view", day0), ("click", day0)))
    val (vn, vnoise, vrel) = r(("view", day0))
    assert(vn == 4L, "the late admissible view must be inside the single release")
    assert(vnoise == noiseOf("view", day0) && vrel == vn + vnoise)
    val (cn, cnoise, crel) = r(("click", day0))
    assert(cn == 2L && cnoise == noiseOf("click", day0) && crel == cn + cnoise)
  }

  test("a replay of the same inputs publishes the identical release (idempotent epsilon-spend)") {
    assert(runOnce() == runOnce())
  }
}
