package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Read-only bridge to the `private[spark]` block-manager storage
  * listing, so the bench pass loop can attribute residual storage to
  * BROADCAST vs RDD(checkpoint) blocks instead of guessing — the
  * instrumentation BENCH_r09's inverted pass profile called for. Same
  * access technique as the sql graftshims; public Spark source
  * knowledge only.
  */
object StorageShim {

  final case class Breakdown(broadcastBytes: Long, rddBytes: Long, otherBytes: Long, blocks: Int)

  def breakdown(sc: SparkContext): Breakdown = {
    var b = 0L; var r = 0L; var o = 0L; var n = 0
    sc.env.blockManager.master.getStorageStatus.foreach { st =>
      st.blocks.foreach { case (id, status) =>
        n += 1
        val sz = status.memSize + status.diskSize
        if (id.isBroadcast) b += sz
        else if (id.isRDD) r += sz
        else o += sz
      }
    }
    Breakdown(b, r, o, n)
  }
}
