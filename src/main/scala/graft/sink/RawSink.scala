package graft.sink

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
  * SURVEY §3.1). Seals are written from per-partition counts computed
  * distributedly and collected — one small row per logical partition.
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
    */
  def writeRun(df: DataFrame, runId: String, schemaVersion: String = "v1"): Seq[SealedPartition] = {
    // Distinct logical partitions + record counts, computed distributedly.
    val counts = df
      .groupBy(PartitionKey.columns.map(col): _*)
      .agg(count(lit(1)).as("record_count"))
      .collect()
      .map { r =>
        val key = PartitionKey(
          r.getAs[String]("source"),
          r.getAs[String]("customer_id"),
          r.getAs[String]("query_name"),
          r.getAs[java.sql.Date]("logical_date"),
        )
        key -> r.getAs[Long]("record_count")
      }

    counts.foreach { case (key, _) =>
      if (isSealed(key, runId))
        throw new IllegalStateException(
          s"refusing overwrite: partition $key run_id=$runId is sealed (raw_sink_contract)"
        )
    }

    // One distributed write for the whole run (fenced by run_id dir).
    df.withColumn("run_id", lit(runId))
      .write
      .partitionBy(PartitionKey.columns :+ "run_id": _*)
      .mode("append") // append is safe: the run_id dir is exclusively ours
      .parquet(root)

    // Metadata-last seal per partition.
    counts.map { case (key, n) =>
      val seal = SealedPartition(key, runId, schemaVersion, n)
      writeSeal(seal)
      seal
    }.toSeq
  }

  private def writeSeal(s: SealedPartition): Unit = {
    val dir = runDir(s.key, s.runId)
    val json =
      s"""{"record_count":${s.recordCount},"schema_version":"${s.schemaVersion}",""" +
        s""""run_id":"${s.runId}","sealed":true}"""
    val out = fs.create(new Path(dir, SealFile), false) // no overwrite: seal is immutable
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

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

  /** All sealed (key, run_id) tuples as a DataFrame (driver-listed;
    * one row per sealed physical partition).
    */
  private def sealedRunsDf(): DataFrame = {
    import scala.jdk.CollectionConverters._
    val it = fs.listFiles(new Path(root), true)
    val rows = Iterator
      .continually(it)
      .takeWhile(_.hasNext)
      .map(_.next())
      .filter(_.getPath.getName == SealFile)
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
    spark.createDataFrame(rows.map(Tuple5Row.tupled).asJava, Tuple5Row.schema)
  }
}

object RawSink {
  val SealFile = "_SEAL.json"

  final case class SealedPartition(
      key: PartitionKey,
      runId: String,
      schemaVersion: String,
      recordCount: Long,
  )

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
