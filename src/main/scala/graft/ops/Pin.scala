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
    *    round instead of ≤1). The AQE flip covers only this one
    *    materialization job;
    *  - `repartition(n, cols)` carries REPARTITION_BY_NUM, so the
    *    layout is also immune to AQE coalescing when consumed.
    */
  def pinPartitioned(
      df: DataFrame,
      parts: Seq[org.apache.spark.sql.Column],
      sortBy: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val rp = df.repartition(n, parts: _*)
      Pin(if (sortBy.isEmpty) rp else rp.sortWithinPartitions(sortBy: _*), eager = true)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
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
