package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage pinning for iterative loops ([[Components]], [[GraphOps]],
  * [[Ranks]]): every round must cut the plan lineage or planning time
  * doubles per iteration. The DEFAULT is `localCheckpoint` — executor
  * block storage, no extra I/O, the right call on a healthy cluster
  * and in local mode.
  *
  * The escape hatch: `localCheckpoint` blocks live on executors, so on
  * a real multi-executor cluster LOSING an executor mid-loop kills the
  * computation (local checkpoints are non-recoverable by design —
  * public Spark scaladoc on `Dataset.localCheckpoint`). For long loops
  * on preemptible/spot executors, set
  *
  * {{{
  * spark.conf.set(Pin.Flag, "true")
  * spark.sparkContext.setCheckpointDir("hdfs://…/checkpoints") // or s3a://
  * }}}
  *
  * and every loop round writes a RELIABLE checkpoint to the fault-
  * tolerant store instead — survivable at the price of one write+read
  * of the (small, shrinking) per-round frame. No query signature
  * changes: the flag is session-scoped runtime conf, flippable per job
  * (`--conf spark.graft.reliableCheckpoints=true`).
  *
  * Mirrors the durability contract the reference states for its
  * control-plane persistence (gads-etl `docs/storage_realism.md:35-40`):
  * transient state may be fast-but-lossy only where a retry can
  * rebuild it; anything a long computation depends on needs a durable
  * home.
  */
object Pin {

  /** Session conf flag: "true" → reliable `checkpoint()` into the
    * configured checkpoint dir; anything else → `localCheckpoint()`.
    */
  val Flag = "spark.graft.reliableCheckpoints"

  def apply(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(Flag).exists(_.equalsIgnoreCase("true"))
    if (reliable) {
      require(
        spark.sparkContext.getCheckpointDir.isDefined,
        s"$Flag=true requires spark.sparkContext.setCheckpointDir(<fault-tolerant dir>)")
      // Persist first: `checkpoint` computes the plan once for its
      // action and AGAIN in the separate job that writes the
      // checkpoint files — the cache turns the second pass into a
      // read. Always eager here (the caller's lazy probe-as-
      // materializer trick saves one job in local mode; in reliable
      // mode the files must exist before unpersist anyway).
      // Cleanup: Spark never deletes reliable checkpoints on its own —
      // set spark.cleaner.referenceTracking.cleanCheckpoints=true so
      // superseded rounds' files are removed as their frames are GC'd,
      // and point the checkpoint dir at a per-job path that the job
      // runner can delete at exit.
      val persisted = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = persisted.checkpoint(eager = true)
      persisted.unpersist()
      out
    } else df.localCheckpoint(eager)
  }

  /** Pin `df` MATERIALIZED IN A CHOSEN LAYOUT: hash-partitioned on
    * `parts` at the session's shuffle parallelism (optionally sorted
    * within partitions), with the partitioning/ordering CAPTURED into
    * the checkpointed frame so every downstream join/aggregate on the
    * same keys plans exchange-free and sort-free against it — the
    * bucketed-table contract without the table. Two non-obvious rules
    * this helper owns (r10, measured):
    *
    *  - the checkpoint must plan NON-adaptively: under AQE,
    *    `Dataset.checkpoint` captures UnknownPartitioning and every
    *    consumer re-exchanges the pinned frame (3 exchanges per LPA
    *    round instead of ≤1). Since r11 the non-adaptive planning is
    *    SCOPED TO A CLONED SESSION (shared SparkContext, private
    *    SQLConf) instead of flipping the caller's session conf — a
    *    concurrent query on the caller's session can never observe
    *    the flip (the r10 verdict's residual #3);
    *  - `repartition(n, cols)` carries REPARTITION_BY_NUM, so the
    *    layout is also immune to AQE coalescing when consumed.
    */
  def pinPartitioned(
      df: DataFrame,
      parts: Seq[org.apache.spark.sql.Column],
      sortBy: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val rp = df.repartition(n, parts: _*)
    pinNonAdaptive(if (sortBy.isEmpty) rp else rp.sortWithinPartitions(sortBy: _*), eager = true)
  }

  /** Pin `df` keeping WHATEVER partitioning its plan already carries
    * (no repartition) — the [[pinPartitioned]] capture rule for frames
    * that are ALREADY laid out right by lineage (e.g. an aggregate or
    * join keyed like the pinned frame it reads): plan non-adaptively
    * in a cloned session so the checkpoint records HashPartitioning
    * instead of AQE's Unknown, and the next round's join/aggregate on
    * the same key stays exchange-free. `eager = false` supports the
    * loop idiom where the round's single probe action materializes
    * the checkpoint.
    */
  def pinAligned(df: DataFrame, eager: Boolean = true): DataFrame =
    pinNonAdaptive(df, eager)

  /** ONE non-adaptive clone per caller session, created lazily and
    * reused for every pin. Memoization is load-bearing, not a nicety:
    * `SparkSession.newSession()` registers that session's
    * ExecutionListenerBus on the SHARED SparkContext listener bus, so
    * a clone per pin call (loops pin every round) accumulates
    * listeners that every subsequent job in the JVM fans events
    * through — measured as a 10–25% drag on UNRELATED queries after a
    * few hundred pins. Weak keys: a retired parent session releases
    * its clone. */
  private val cloneCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, org.apache.spark.sql.SparkSession]

  /** Materialize the checkpoint under a CLONED session with adaptive
    * execution off, then rebind the resulting checkpoint scan to the
    * caller's session. The clone shares the SparkContext (so blocks,
    * broadcasts and the checkpoint RDD are the same), but its SQLConf
    * is private: no session-global conf mutation is observable by any
    * concurrent query. Runtime conf the materialization depends on
    * ([[Flag]], shuffle partitions) is re-copied from the caller on
    * every pin, so caller-side conf changes stay visible; two threads
    * pinning concurrently with DIFFERENT shuffle-partition settings
    * would race on the shared clone conf — graft's loop operators pin
    * sequentially within a query, and cross-query isolation (the
    * point of the clone) is unaffected.
    */
  private def pinNonAdaptive(df: DataFrame, eager: Boolean): DataFrame = {
    import org.apache.spark.sql.graftshim.DatasetShim
    val spark = df.sparkSession
    val clone = cloneCache.synchronized {
      cloneCache.computeIfAbsent(spark, s => s.newSession())
    }
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    // keep plan-affecting session conf the materialization relies on
    Seq(Flag, "spark.sql.shuffle.partitions").foreach { k =>
      spark.conf.getOption(k) match {
        case Some(v) => clone.conf.set(k, v)
        case None => clone.conf.unset(k)
      }
    }
    val bound = DatasetShim.ofRows(clone, df.queryExecution.analyzed)
    val pinned = Pin(bound, eager)
    DatasetShim.ofRows(spark, pinned.queryExecution.analyzed)
  }

  /** Release a SUPERSEDED pinned frame's blocks now instead of at
    * ContextCleaner leisure. Loop operators call this on round t−1
    * once round t is materialized: without it a 20-round components
    * run holds 20 generations of label blocks until the query ends
    * and GC runs — dead weight that becomes the NEXT query's memory
    * pressure (the r9 bench artifact's accumulation suspect). No-op
    * for reliable checkpoints (file-backed; cleaned by
    * `spark.cleaner.referenceTracking.cleanCheckpoints`).
    */
  def unpin(df: DataFrame): Unit =
    org.apache.spark.sql.graftshim.RddShim.unpersistPinned(df)

  /** `df.pinLineage(eager)` — chainable form of [[Pin.apply]]. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pinLineage(eager: Boolean = true): DataFrame = Pin(df, eager)
    def unpin(): Unit = Pin.unpin(df)
  }
}
