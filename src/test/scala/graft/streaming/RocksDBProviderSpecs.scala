package graft.streaming

import graft.SparkSpec

/** Re-runs every streaming-twin spec under the PRODUCTION state store.
  *
  * All bounded-state claims (SpaceSaving eviction, CDC O(1) fold,
  * attribution compaction, dedup base state, SCD2 current-row state)
  * were proven on the default HDFSBackedStateStoreProvider — an
  * in-JVM-heap map. At 100 TB streaming state the deployment choice is
  * the RocksDB provider (off-heap, spillable, incremental-checkpoint);
  * these subclasses flip the ONE conf a production job flips and run
  * the identical assertions, pinning that no twin depends on the
  * in-memory provider's semantics (reference equality, eager
  * visibility of uncommitted puts, iteration order, value mutation
  * after put — the classic provider-coupling hazards).
  *
  * The conf is read at QUERY START, so setting it around each suite on
  * the shared session is sufficient and reversible; suites run
  * sequentially in the forked test JVM.
  */
trait RocksDBState extends SparkSpec {
  private val key = "spark.sql.streaming.stateStore.providerClass"
  private var prior: Option[String] = None
  override protected def beforeAll(): Unit = {
    super.beforeAll()
    prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  }
  override protected def afterAll(): Unit = {
    prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    super.afterAll()
  }
}

class StatefulSessionizerRocksSpec extends StatefulSessionizerSpec with RocksDBState
class StreamingAnomalyRocksSpec extends StreamingAnomalySpec with RocksDBState
class StreamingAttributionRocksSpec extends StreamingAttributionSpec with RocksDBState
class StreamingCdcRocksSpec extends StreamingCdcSpec with RocksDBState
class StreamingCmsFreqRocksSpec extends StreamingCmsFreqSpec with RocksDBState
class StreamingDpReleaseRocksSpec extends StreamingDpReleaseSpec with RocksDBState
class StreamingFactMaintenanceRocksSpec extends StreamingFactMaintenanceSpec with RocksDBState
class StreamingFunnelRocksSpec extends StreamingFunnelSpec with RocksDBState
class StreamingHeavyHittersRocksSpec extends StreamingHeavyHittersSpec with RocksDBState
class StreamingIncrementalDedupRocksSpec extends StreamingIncrementalDedupSpec with RocksDBState
class StreamingNearDupLedgerRocksSpec extends StreamingNearDupLedgerSpec with RocksDBState
class StreamingIngestRocksSpec extends StreamingIngestSpec with RocksDBState
class StreamingKmvReachRocksSpec extends StreamingKmvReachSpec with RocksDBState
class StreamingOpsRocksSpec extends StreamingOpsSpec with RocksDBState
class StreamingScd2RocksSpec extends StreamingScd2Spec with RocksDBState
