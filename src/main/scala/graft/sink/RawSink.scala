package graft.sink

import graft.ops.Pin.PinOps
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PartitionKey

/** Run-fenced, immutable, hive-partitioned raw sink (reference contract:
  * docs/raw_sink_contract.md:15-31; writers raw_sink_local.py:11-48,
  * raw_sink_object.py:27-133).
  *
  * Layout (identical key scheme to the reference):
  * {{{
  * <root>/source=<s>/customer_id=<c>/query_name=<q>/logical_date=<d>/run_id=<r>/
  *     part-*.parquet          # payload (K1) — parquet, not JSONL: columnar wins
  *     _SEAL.json              # metadata, written LAST (K2): the seal
  * }}}
  *
  * Semantics carried over exactly:
  *  - metadata-last seal: a partition is invisible/incomplete until
  *    `_SEAL.json` exists (K2, raw_sink_local.py:44-48);
  *  - overwrite refusal: writing into a sealed (key, run_id) throws
  *    (K3, raw_sink_object.py:56-62);
  *  - run fencing: concurrent attempts write distinct `run_id=` dirs and
  *    never collide (docs/parallel_safety.md) — which is also what makes
  *    this safe for thousands of concurrent executors: the write job for
  *    one run owns its directory exclusively.
  *
  * Scale: the payload write is one distributed `partitionBy` job (all
  * logical partitions of a run in a single pass — no per-partition
  * driver loop like the reference's nested query×customer iteration,
  * SURVEY §3.1). Seals are written EXECUTOR-SIDE from the distributed
  * per-partition counts (no driver collect in the write path), and a
  * seal MANIFEST table at `<root>/_manifest` indexes every sealed
  * (key, run_id) so the read side joins one small parquet table
  * instead of recursively listing millions of directories. A sink
  * written without a manifest (e.g. by the reference) still reads —
  * [[sealedRuns]] falls back to listing — and [[repairManifest]]
  * reconciles the index from the directory tree after a crash between
  * seal and manifest append.
  */
final class RawSink(spark: SparkSession, root: String) {
  import RawSink._

  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(hadoopConf)

  private def runDir(key: PartitionKey, runId: String): Path =
    new Path(
      s"$root/source=${key.source}/customer_id=${key.customerId}" +
        s"/query_name=${key.queryName}/logical_date=${key.logicalDate}/run_id=$runId"
    )

  def isSealed(key: PartitionKey, runId: String): Boolean =
    fs.exists(new Path(runDir(key, runId), SealFile))

  /** K1+K2: write all logical partitions present in `df` under one
    * `run_id`, then seal each. `df` must carry the four key columns
    * plus payload columns. Throws if any targeted (key, run_id) is
    * already sealed (K3) — checked before any byte is written.
    *
    * Every per-partition step runs on executors: the K3 pre-check, the
    * seal writes (metadata-last, after the payload job completes), and
    * the manifest append. The returned Seq is a convenience collect of
    * the run's own seal rows (one per logical partition of THIS run) —
    * callers working at million-partition scale should use
    * [[sealedRuns]] instead.
    */
  def writeRun(df: DataFrame, runId: String, schemaVersion: String = "v1"): Seq[SealedPartition] = {
    import spark.implicits._
    // Distinct logical partitions + record counts, computed
    // distributedly; checkpointed so the three small jobs below reuse
    // the aggregation instead of re-scanning the payload.
    val seals = df
      .groupBy(PartitionKey.columns.map(col): _*)
      .agg(count(lit(1)).as("record_count"))
      .withColumn("run_id", lit(runId))
      .withColumn("schema_version", lit(schemaVersion))
      .pinLineage()
      .as[SealRow]

    // K3, distributedly: any targeted (key, run_id) already sealed?
    val confFactory = org.apache.spark.sql.graftshim.ConfShim.confFactory(hadoopConf)
    val rootStr = root
    val clash = seals
      .mapPartitions { it =>
        val conf = confFactory()
        it.filter(s => RawSink.sealExists(conf, rootStr, s))
      }
      .take(1)
    if (clash.nonEmpty)
      throw new IllegalStateException(
        s"refusing overwrite: partition ${clash.head} is sealed (raw_sink_contract)")

    // One distributed write for the whole run (fenced by run_id dir).
    df.withColumn("run_id", lit(runId))
      .write
      .partitionBy(PartitionKey.columns :+ "run_id": _*)
      .mode("append") // append is safe: the run_id dir is exclusively ours
      .parquet(root)

    // Metadata-last seals, executor-side. create(overwrite=false) makes
    // each seal an atomic claim; a task RETRY hitting its own seal is
    // idempotent (identical deterministic content), while foreign seals
    // were excluded by the K3 check above.
    seals.foreachPartition { (it: Iterator[SealRow]) =>
      val conf = confFactory()
      it.foreach(s => RawSink.writeSealFile(conf, rootStr, s))
    }

    // Index the new seals in the manifest (one small distributed append).
    seals.toDF().write.mode("append").parquet(manifestDir)

    seals.collect().map(_.toSealedPartition).toSeq
  }

  /** Maintenance: rewrite each logical partition's AUTHORITATIVE rows
    * (the J3 ledger gate) as ONE file per partition under a new sealed
    * run — executing the small-file consolidation the q171 planner
    * sizes. Sealed data is immutable (K3), so compaction never
    * rewrites in place: the consolidated copy is an ordinary new run;
    * the caller re-validates it into the ledger like any extraction
    * run, after which [[vacuumSuperseded]] reclaims the fragmented
    * originals. At 100 TB this is the periodic job that keeps
    * files ∝ logical partitions instead of ∝ (partitions × writer
    * tasks × runs).
    */
  def compactRuns(
      states: DataFrame,
      newRunId: String,
      schemaVersion: String = "v1",
  ): Seq[SealedPartition] = {
    val rows = authoritativeRows(states).drop("run_id")
    // co-locate each logical partition in one task → one output file
    // per partition dir under the new run
    writeRun(rows.repartition(PartitionKey.columns.map(col): _*), newRunId, schemaVersion)
  }

  /** Maintenance: delete run directories that are superseded — not
    * among the newest `keepRuns` sealed runs of their logical
    * partition AND strictly older than that partition's
    * ledger-VALIDATED (Success) run — the retention pass that stops
    * superseded extractions accumulating forever.
    *
    * The validated-supersession guard is the safety core: a run is
    * reclaimable only once a NEWER run of the same partition has
    * passed validation. That covers both ledger-trailing shapes the
    * naive "keep newest + keep authority" rule gets wrong:
    *  - a sealed but never-validated re-extraction (authority
    *    legitimately trails the newest seal) — the served run stays;
    *  - a re-extraction that FAILED validation: the ledger's
    *    last-writer row for the key is now `Failed` (run-id order
    *    outranks status in [[graft.state.StateStore.upsert]]'s total
    *    order), so the key has NO Success row — and retention must
    *    then delete nothing for that key, or it would destroy the
    *    last validated data (run r1) while the key is mid-retry.
    *
    * Returns the number of run directories removed, and rewrites the
    * manifest to the survivors. OFFLINE maintenance: the manifest
    * rewrite is not atomic for concurrent readers — run it in the
    * same maintenance window as any VACUUM.
    */
  def vacuumSuperseded(states: DataFrame, keepRuns: Int = 1): Long = {
    require(keepRuns >= 1, "keepRuns must be >= 1")
    repairManifest(): Unit // make the index authoritative before editing it
    val manifest = manifestFiles() match {
      case Some(files) => spark.read.parquet(files: _*)
      case None => return 0L // empty sink
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(PartitionKey.columns.map(col): _*)
      .orderBy(col("run_id").desc)
    val auth = states
      .where(col("status") === graft.model.PartitionState.Success &&
        col("current_run_id").isNotNull)
      .select(PartitionKey.columns.map(col) :+ col("current_run_id").as("__auth_run"): _*)
    // pinned: the manifest rewrite below replaces the files this derives from
    val victims = manifest
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") > keepRuns)
      .drop("__rk")
      // inner join: keys with no validated run contribute NO victims
      .join(auth, PartitionKey.columns)
      .where(col("run_id") < col("__auth_run"))
      .drop("__auth_run")
      .pinLineage()
    val n = victims.count()
    if (n > 0) {
      val confFactory = org.apache.spark.sql.graftshim.ConfShim.confFactory(hadoopConf)
      val rootStr = root
      import spark.implicits._
      victims.as[RawSink.SealRow].foreachPartition { (it: Iterator[RawSink.SealRow]) =>
        val conf = confFactory()
        it.foreach { s =>
          val dir = RawSink.runDirPath(rootStr, s)
          dir.getFileSystem(conf).delete(dir, true): Unit
        }
      }
      val survivors = spark.read.parquet(manifestFiles().get: _*)
        .join(victims.select(RawSink.Tuple5Row.schema.fieldNames.map(col): _*),
          RawSink.Tuple5Row.schema.fieldNames.toSeq, "left_anti")
        .pinLineage()
      survivors.write.mode("overwrite").parquet(manifestDir)
    }
    n
  }

  private def manifestDir: String = s"$root/$ManifestDir"

  /** S5: read one seal back (driver-side; seals are tiny). */
  def readSeal(key: PartitionKey, runId: String): Option[String] = {
    val p = new Path(runDir(key, runId), SealFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** S6: discover run_ids for a logical partition, ascending (ISO run
    * ids sort lexicographically == chronologically, T5).
    */
  def listRuns(key: PartitionKey): Seq[String] = {
    val parent = runDir(key, "x").getParent
    if (!fs.exists(parent)) Seq.empty
    else
      fs.listStatus(parent)
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith("run_id="))
        .map(_.stripPrefix("run_id="))
        .sorted
        .toSeq
  }

  /** S4/S6: read the whole sink with partition columns recovered. Only
    * *sealed* runs are visible — the read-side half of the metadata-last
    * contract (an unsealed partial write is never observable).
    */
  def readAll(): DataFrame = {
    // An unwritten sink reads as empty (key columns only) rather than
    // throwing — mirrors listRuns' missing-directory behavior.
    if (!fs.exists(new Path(root)) || !fs.listFiles(new Path(root), true).hasNext)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), RawSink.Tuple5Row.schema)
    // Partition-column type inference would read a numeric-looking
    // customer_id dir as long — and a post-hoc cast back to string is
    // LOSSY ("007" → 7 → "7", breaking the seal join). Disable
    // inference for this read so directory strings survive verbatim,
    // then cast only logical_date (string→date is lossless for the
    // contract's ISO dates).
    val confKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "false")
    val df =
      try spark.read.option("basePath", root).parquet(root)
      finally prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    df.withColumn("logical_date", col("logical_date").cast("date"))
      .join(sealedRunsDf(), PartitionKey.columns :+ "run_id", "left_semi")
  }

  /** J3: the consumer gate — only rows whose (key, run_id) is the
    * authoritative success in `states` are visible
    * (consumer_preview.py:28-43; docs/consumer_contract.md:12-17).
    * `states` must carry the key columns + current_run_id + status.
    */
  def authoritativeRows(states: DataFrame): DataFrame = {
    val gate = states
      .where(col("status") === graft.model.PartitionState.Success && col("current_run_id").isNotNull)
      .select(
        PartitionKey.columns.map(col) :+ col("current_run_id").as("run_id"): _*
      )
    readAll().join(gate, PartitionKey.columns :+ "run_id", "left_semi")
  }

  /** Consumer preview (reference §3.3: consumer_preview.py:28-43 +
    * docs/consumer_contract.md): the state-gated view sampled to the
    * first `sampleRows` rows per logical partition, ordered by
    * `orderCol`. The whole read path in one expression: gate (J3) →
    * per-partition head-N (T4).
    */
  def preview(states: DataFrame, sampleRows: Int, orderCols: String*): DataFrame = {
    require(orderCols.nonEmpty,
      "preview needs an ordering; pass columns forming a total order " +
        "within a partition (e.g. an event id) or sampling is nondeterministic")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(PartitionKey.columns.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    authoritativeRows(states)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= sampleRows)
      .drop("__rn")
  }

  /** All sealed (key, run_id) tuples as a DataFrame. Reads the
    * `_manifest` parquet index when present (one small columnar scan,
    * regardless of partition count); falls back to a recursive
    * directory listing for manifest-less sinks (reference-written
    * trees, or pre-manifest layouts).
    *
    * Once a manifest exists it is authoritative: a MANIFEST-UNAWARE
    * writer (the reference Python sink) sealing runs into the same
    * root afterwards leaves them unindexed — run [[repairManifest]]
    * after any foreign write to reconcile. Mixed-writer roots are an
    * interop scenario, not the normal deployment (graft's own
    * `writeRun` always appends the index).
    */
  def sealedRuns(): DataFrame =
    manifestFiles() match {
      case Some(files) =>
        spark.read.parquet(files: _*).select(Tuple5Row.schema.fieldNames.map(col): _*)
      case None => listedSealedRuns()
    }

  /** Manifest part files, if the index exists and is non-empty. Listed
    * explicitly because the `_`-prefixed manifest dir is (by design)
    * hidden from Spark's data-file discovery — the same convention that
    * keeps it out of [[readAll]]'s recursive payload read.
    */
  private def manifestFiles(): Option[Seq[String]] = {
    val dir = new Path(manifestDir)
    if (!fs.exists(dir)) None
    else {
      val parts = fs.listStatus(dir)
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString).toSeq
      if (parts.isEmpty) None else Some(parts)
    }
  }

  private def sealedRunsDf(): DataFrame = sealedRuns()

  /** Reconcile the manifest with the directory tree: any sealed run dir
    * missing from the index (crash between seal write and manifest
    * append) is re-appended. Idempotent; returns the number of repaired
    * rows. The listing path is the expensive O(directories) walk — this
    * is a recovery tool, not a hot path.
    */
  def repairManifest(): Long = {
    val listed = listedSealedRuns()
    val known = manifestFiles() match {
      case Some(files) =>
        spark.read.parquet(files: _*).select(Tuple5Row.schema.fieldNames.map(col): _*)
      case None => listed.limit(0)
    }
    val missing = listed.join(known, Tuple5Row.schema.fieldNames.toSeq, "left_anti")
    val n = missing.count()
    if (n > 0) {
      // seal JSON carries record_count/schema_version; re-read executor-side
      val confFactory = org.apache.spark.sql.graftshim.ConfShim.confFactory(hadoopConf)
      val rootStr = root
      import spark.implicits._
      missing
        .as[Tuple5RowCase]
        .mapPartitions { it =>
          val conf = confFactory()
          it.map(t => RawSink.readSealRow(conf, rootStr, t))
        }
        .toDF()
        .write.mode("append").parquet(manifestDir)
    }
    n
  }

  /** Driver-side recursive listing of sealed runs (fallback/repair path). */
  private def listedSealedRuns(): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows =
      if (!fs.exists(new Path(root))) Seq.empty
      else {
        val it = fs.listFiles(new Path(root), true)
        Iterator
          .continually(it)
          .takeWhile(_.hasNext)
          .map(_.next())
          .filter(_.getPath.getName == SealFile)
          .filterNot(_.getPath.toString.contains(s"/$ManifestDir/"))
          .map { st =>
            val dir = st.getPath.getParent
            def part(p: Path, prefix: String): String = {
              var cur = p
              while (cur != null && !cur.getName.startsWith(prefix)) cur = cur.getParent
              require(cur != null, s"missing $prefix in ${st.getPath}")
              cur.getName.stripPrefix(prefix)
            }
            (
              part(dir, "source="),
              part(dir, "customer_id="),
              part(dir, "query_name="),
              java.sql.Date.valueOf(part(dir, "logical_date=")),
              part(dir, "run_id="),
            )
          }
          .toSeq
      }
    spark.createDataFrame(rows.map(Tuple5Row.tupled).asJava, Tuple5Row.schema)
  }
}

object RawSink {
  val SealFile = "_SEAL.json"
  val ManifestDir = "_manifest"

  final case class SealedPartition(
      key: PartitionKey,
      runId: String,
      schemaVersion: String,
      recordCount: Long,
  )

  /** Flat executor-side seal row (also the manifest schema). */
  final case class SealRow(
      source: String,
      customer_id: String,
      query_name: String,
      logical_date: java.sql.Date,
      record_count: Long,
      run_id: String,
      schema_version: String,
  ) {
    def toSealedPartition: SealedPartition =
      SealedPartition(
        PartitionKey(source, customer_id, query_name, logical_date),
        run_id, schema_version, record_count)
  }

  private[sink] case class Tuple5RowCase(
      source: String,
      customer_id: String,
      query_name: String,
      logical_date: java.sql.Date,
      run_id: String,
  )

  private[sink] def runDirPath(root: String, s: SealRow): Path =
    new Path(
      s"$root/source=${s.source}/customer_id=${s.customer_id}" +
        s"/query_name=${s.query_name}/logical_date=${s.logical_date}/run_id=${s.run_id}")

  private[sink] def sealExists(
      conf: org.apache.hadoop.conf.Configuration, root: String, s: SealRow): Boolean = {
    val p = new Path(runDirPath(root, s), SealFile)
    p.getFileSystem(conf).exists(p)
  }

  /** Schemes whose FileSystems are OBJECT STORES: (a) an in-progress
    * create is INVISIBLE until close (a PUT materializes whole objects
    * only — no partial-file visibility), and (b) rename is a
    * non-atomic copy+delete, so the tmp+rename claim used elsewhere
    * offers no atomicity there. On these, the claim is the single-shot
    * conditional create below.
    */
  private val ObjectStoreSchemes =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos", "swift")

  /** Executor-side metadata-last seal write. `overwrite = false` makes
    * the create an atomic claim. An already-present seal is tolerated
    * ONLY when its content is byte-identical to what this task would
    * write — that is a task retry re-claiming its own deterministic
    * output. A differing seal (another writer's run with the same
    * run_id but different counts — outside the run-fence contract,
    * where run ids are minted uniquely per attempt) throws instead of
    * silently double-writing. Narrow catch: only already-exists
    * failures are inspected; unrelated IO errors (missing parent dir,
    * permissions) propagate and fail the write job before the manifest
    * is appended.
    *
    * CLAIM STRATEGY BY STORAGE CLASS (the reference's object-backend
    * finalize refuses when `metadata.json` exists —
    * gads-etl `raw_sink_object.py:115-133`, `docs/storage_realism.md:35-40`
    * — but a bare exists-check has a TOCTOU window; each backend gets
    * the strongest primitive it actually offers):
    *
    *  - POSIX `file:` — hard-link publish: `link(2)` fails EEXIST
    *    atomically in the kernel.
    *  - HDFS-like (default) — write-temp-then-rename: rename without
    *    overwrite is atomic at the NameNode and rejects an existing
    *    destination.
    *  - Object stores ([[ObjectStoreSchemes]]) — CONDITIONAL PUT:
    *    one `create(seal, overwrite=false)` writing the whole (tiny)
    *    seal. No tmp object is needed — a PUT that dies mid-write
    *    materializes nothing. On connectors with conditional-write
    *    support (e.g. S3A's `fs.s3a.create.conditional.enabled`,
    *    which maps close() to an `If-None-Match: *` PUT), the claim is
    *    atomic AT THE STORE; enable it in production. Connectors
    *    without it degrade to HEAD-then-PUT — a narrow double-PUT
    *    window between two writers racing the SAME (key, run_id),
    *    which the run-fence contract already forbids; and because both
    *    racers' payloads are complete by seal time, the clobber is
    *    between byte-identical seals of equal-validity runs. The
    *    MANIFEST stays the arbiter of record either way: consumers
    *    discover runs through the manifest index, which is appended
    *    exactly once per writeRun AFTER all seals land.
    */
  private[sink] def writeSealFile(
      conf: org.apache.hadoop.conf.Configuration, root: String, s: SealRow): Unit = {
    val dir = runDirPath(root, s)
    val fs = dir.getFileSystem(conf)
    val sealPath = new Path(dir, SealFile)
    val json =
      s"""{"record_count":${s.record_count},"schema_version":"${s.schema_version}",""" +
        s""""run_id":"${s.run_id}","sealed":true}"""
    def existingMatches(): Boolean = {
      val in = fs.open(sealPath)
      val existing =
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      existing == json
    }
    def verifyOrThrow(): Unit =
      if (!existingMatches())
        throw new IllegalStateException(
          s"seal conflict at $sealPath: existing seal differs from this run's " +
            "(concurrent writers sharing a run_id violate the run-fence contract)")
    if (ObjectStoreSchemes.contains(fs.getScheme)) {
      // Conditional-put claim: whole-object PUT-if-absent. A partial
      // write materializes nothing on an object store, so there is no
      // partial-seal hazard and no tmp object. The connector surfaces a
      // lost conditional write as FileAlreadyExistsException at create
      // (HEAD path) or as a remote-conflict IOException at close (true
      // If-None-Match path) — both mean "lost the claim", both routes
      // content-check the winner.
      val claimed =
        try {
          val out = fs.create(sealPath, false)
          try out.write(json.getBytes(StandardCharsets.UTF_8))
          finally out.close()
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException => false
          case e: java.io.IOException
              if e.getClass.getSimpleName == "RemoteFileChangedException" =>
            false
        }
      if (!claimed) verifyOrThrow()
      return
    }
    // Write-temp-then-rename: a bare create-then-write would let a task
    // that died mid-write leave a PARTIAL seal which every retry then
    // misreads as a foreign conflict. The rename publishes the complete
    // file atomically; if a seal already exists the rename loses and we
    // content-check it (complete by construction — only whole files are
    // ever renamed in).
    val tmp = new Path(dir, s"$SealFile.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try {
      // The publish must be an atomic EXCLUSIVE claim of the final
      // path. POSIX-backed FileSystems (RawLocal/Local) implement
      // rename as renameTo, which silently REPLACES an existing
      // destination — an exists() pre-check alone leaves a TOCTOU
      // window where two racing writers both see "absent" and the
      // second clobbers the first without either calling
      // verifyOrThrow. On file: schemes the claim is therefore
      // link(2) (createLink fails with EEXIST atomically in the
      // kernel); HDFS/object-store FileSystems keep the tmp+rename
      // claim, whose no-replace semantics ARE atomic there (the
      // NameNode/store rejects an existing destination).
      val claimed =
        if (fs.getScheme == "file") {
          val nioDst = java.nio.file.Paths.get(fs.makeQualified(sealPath).toUri.getPath)
          val nioTmp = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
          try { java.nio.file.Files.createLink(nioDst, nioTmp); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
        } else fs.rename(tmp, sealPath)
      if (!claimed) verifyOrThrow()
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => verifyOrThrow()
    } finally {
      if (fs.exists(tmp)) fs.delete(tmp, false)
    }
  }

  /** Executor-side seal read for manifest repair: parse record_count /
    * schema_version back out of the seal JSON (tiny, one per dir).
    */
  private[sink] def readSealRow(
      conf: org.apache.hadoop.conf.Configuration, root: String, t: Tuple5RowCase): SealRow = {
    val dir = new Path(
      s"$root/source=${t.source}/customer_id=${t.customer_id}" +
        s"/query_name=${t.query_name}/logical_date=${t.logical_date}/run_id=${t.run_id}")
    val p = new Path(dir, SealFile)
    val in = p.getFileSystem(conf).open(p)
    val json =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    def field(name: String): String =
      json.split(s""""$name":""")(1).split("[,}]")(0).trim.stripPrefix("\"").stripSuffix("\"")
    SealRow(
      t.source, t.customer_id, t.query_name, t.logical_date,
      field("record_count").toLong, t.run_id, field("schema_version"))
  }

  private[sink] case class Tuple5Row(
      source: String,
      customer_id: String,
      query_name: String,
      logical_date: java.sql.Date,
      run_id: String,
  )
  private[sink] object Tuple5Row {
    val tupled: ((String, String, String, java.sql.Date, String)) => org.apache.spark.sql.Row = {
      case (a, b, c, d, e) => org.apache.spark.sql.Row(a, b, c, d, e)
    }
    val schema: org.apache.spark.sql.types.StructType = {
      import org.apache.spark.sql.types._
      StructType(Seq(
        StructField("source", StringType),
        StructField("customer_id", StringType),
        StructField("query_name", StringType),
        StructField("logical_date", DateType),
        StructField("run_id", StringType),
      ))
    }
  }
}
