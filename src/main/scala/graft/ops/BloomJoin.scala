package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-accelerated key-set membership: the semi/anti-join
  * pre-filter for the regime where the key set is too large to
  * broadcast as an exact hash relation but its BLOOM fits anywhere
  * (10⁹ keys ≈ 1.2 GB as a hash table vs ~170 MB of bloom bits at 1%
  * fpp — and fpp is a dial, not a correctness risk, because an exact
  * join always finishes the job on the ~1% of false-positive
  * survivors).
  *
  * This is the same machinery Spark's own `InjectRuntimeFilter` plants
  * under shuffle joins (public Spark source:
  * `sql/catalyst/.../BloomFilterMightContain.scala`,
  * `aggregate/BloomFilterAggregate.scala`), surfaced as an explicit
  * operator: build the filter over the key side with the public
  * distributed sketch (`Dataset.stat.bloomFilter`, a treeAggregate —
  * executors each build partial filters, merged in a tree, never a
  * driver-side row loop), then probe with the native codegen'd
  * `BloomFilterMightContain` predicate — zero UDFs, the probe stays
  * inside WholeStageCodegen and drops rows AT THE SCAN, before any
  * exchange.
  *
  * At 100 TB the economics: a shuffle semi-join moves the whole fact
  * table; with the bloom planted first, only rows that (probably)
  * match ever enter the exchange — at a selective key set that is a
  * 10-100× shuffle-volume cut for one broadcast of bloom bits.
  *
  * Reference tie-in: the reference gates consumer reads on key-set
  * membership derived from state (gads-etl `state/validator.py`
  * success-set semantics, SURVEY.md E4/J3); this is that operator at
  * the scale where the success set itself is big data.
  */
object BloomJoin {

  /** The sketch inserts and probes raw LONGS end to end
    * (`putLong`/`mightContainLong`). Integral keys ride through
    * directly; any other type (string ids, dates, binary digests) is
    * bridged by hashing to a long with the codegen'd `xxhash64` ON
    * BOTH SIDES — a hash collision is just one more false positive,
    * and the exact join cleans those by contract. (Before the bridge,
    * a non-integral key would insert UTF8 bytes but probe a null cast
    * — silently-empty semi-joins; the type switch makes the
    * representation agreement structural.)
    *
    * NULL keys under the hash bridge: `xxhash64(NULL)` is the seed,
    * not NULL — a phantom insert on the key side (inflates fpp only)
    * and a non-NULL probe on the fact side; either probe outcome is
    * correct because the exact join/anti-join decides NULL semantics.
    */
  private def isIntegral(df: DataFrame, c: String): Boolean = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(c).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
  }

  private def probeExpr(df: DataFrame, c: String): Column =
    if (isIntegral(df, c)) df(c).cast("long")
    else org.apache.spark.sql.functions.xxhash64(df(c))

  /** The build and probe sides must agree on the bridge REPRESENTATION,
    * not just each pick one: integral keys insert raw longs while
    * everything else inserts `xxhash64(key)`, so a string key side
    * against a long fact side would insert one representation and probe
    * another — bloomSemiJoin would silently drop true matches and
    * bloomAntiJoin would emit matching rows as definite non-members.
    * Disagreement is a caller bug (the exact join downstream would also
    * be comparing through an implicit coercion); fail loudly and make
    * the caller cast one side. Integral widths may differ (both ride
    * `putLong`); non-integral sides must share the exact type because
    * `xxhash64` hashes the type's byte representation.
    */
  private def requireBridgeAgreement(
      fact: DataFrame, factKey: String, keys: DataFrame, keyCol: String): Unit = {
    val ft = fact.schema(factKey).dataType
    val kt = keys.schema(keyCol).dataType
    val ok = (isIntegral(fact, factKey) && isIntegral(keys, keyCol)) || ft == kt
    require(ok,
      s"bloom bridge mismatch: fact[$factKey]=$ft vs keys[$keyCol]=$kt — the filter " +
        "would insert one representation and probe another (silent false negatives). " +
        "Cast one side so both are integral or both share the same type.")
  }

  /** Sentinel: size the filter from a cheap `approx_count_distinct`
    * pre-pass over the key side (one HLL aggregate — O(key rows) scan,
    * constant state, no exact count job). A fixed guess degrades the
    * observed fpp as soon as the real key count outgrows it; the
    * pre-pass keeps bits ∝ the actual cardinality, +25% headroom for
    * the HLL's ~5% rsd. Sizing is still never a correctness knob — the
    * exact join cleans whatever passes.
    */
  val AutoSize = -1L

  private def resolveItems(keyFrame: DataFrame, keyCol: String, expectedItems: Long): Long =
    if (expectedItems > 0L) expectedItems
    else {
      val approx = keyFrame
        .agg(org.apache.spark.sql.functions.approx_count_distinct(keyCol).as("n"))
        .head().getLong(0)
      math.max(64L, approx + approx / 4)
    }

  /** Distributed bloom build over `keys.col(keyCol)` (integral keys
    * insert raw; any other type inserts `xxhash64(key)` — probe with
    * the same bridge). Returns the serialized filter — `O(numBits)`
    * bytes on the driver, the same order as any broadcast relation,
    * NOT O(keys). `expectedItems = AutoSize` sizes from key-side stats.
    */
  def buildBloom(keys: DataFrame, keyCol: String, expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val longKeys =
      if (isIntegral(keys, keyCol)) keys
      else keys.select(probeExpr(keys, keyCol).as(keyCol))
    val bf = longKeys.stat.bloomFilter(
      keyCol, math.max(1L, resolveItems(longKeys, keyCol, expectedItems)), fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe against a built filter. `key` must be
    * integral (the sketch hashes raw longs; `Dataset.stat.bloomFilter`
    * inserted them via `putLong`, and `BloomFilterMightContain`
    * probes with `mightContainLong` — same hash path end to end).
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnShim.column(
      BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        ColumnShim.expression(key.cast("long"))))

  /** Exact semi-join with a bloom pre-filter: probe drops non-members
    * scan-side (modulo fpp), the equi-join cleans the false positives.
    * Result is EXACTLY `fact SEMI JOIN keys` — the bloom changes the
    * plan's economics, never its answer.
    *
    * `expectedItems` sizes the filter; callers that know the key-side
    * cardinality (a ledger count, table stats) should pass it. The
    * default [[AutoSize]] runs one approx_count_distinct over the
    * (already-distinct-projected) key side first — bits stay ∝ real
    * cardinality instead of a guess the data outgrows.
    */
  def bloomSemiJoin(
      fact: DataFrame,
      keys: DataFrame,
      factKey: String,
      keyCol: String,
      fpp: Double = 0.01,
      expectedItems: Long = AutoSize,
  ): DataFrame = {
    requireBridgeAgreement(fact, factKey, keys, keyCol)
    val keyFrame = keys.select(keyCol).distinct()
    val bloom = buildBloom(keyFrame, keyCol, expectedItems, fpp)
    fact
      .where(mightContain(bloom, probeExpr(fact, factKey)))
      .join(keyFrame, fact(factKey) === keyFrame(keyCol), "left_semi")
  }

  /** Exact anti-join with a bloom pre-filter. The bloom can only
    * produce false POSITIVES, so definite non-members (`NOT
    * mightContain`) are already correct anti-join output and bypass
    * the join; only the `mightContain` rows (true members + ~fpp false
    * positives) route through the exact anti-join:
    * result = fact[¬might] ∪ antijoin(fact[might], keys).
    *
    * Deliberate trade: the fact is SCANNED twice (once per branch) so
    * that only the member-ish fraction is ever SHUFFLED. Scans are the
    * cheap side at scale (columnar, pushdown, often cached); the
    * exchange is the bottleneck this operator exists to shrink.
    *
    * CORRECTNESS requirement, not just cost: the two branches must see
    * the SAME rows with the SAME key values — `fact` must be
    * deterministic and stable between reads (a parquet/ORC snapshot, a
    * persisted frame). A source that is non-deterministic or mutates
    * between scans can classify a row differently per branch and drop
    * or duplicate it. For such inputs, persist/localCheckpoint the
    * fact (or at minimum the key column) first; file-backed tables —
    * every registered query here — are stable by construction.
    */
  def bloomAntiJoin(
      fact: DataFrame,
      keys: DataFrame,
      factKey: String,
      keyCol: String,
      fpp: Double = 0.01,
      expectedItems: Long = AutoSize,
  ): DataFrame = {
    requireBridgeAgreement(fact, factKey, keys, keyCol)
    val keyFrame = keys.select(keyCol).distinct()
    val bloom = buildBloom(keyFrame, keyCol, expectedItems, fpp)
    // NULL keys: mightContain(null) is NULL, which `where` treats as
    // false in BOTH branches — without the coalesce a null-keyed fact
    // row would vanish, while the exact anti-join KEEPS it (NULL never
    // equals any key). Route nulls to the definite-non-member branch.
    // The serialized filter bits appear once per branch in the plan —
    // an accepted cost of the two-branch shape (persist the fact and
    // project the probe once if the doubled literal matters).
    val maybe = coalesce(mightContain(bloom, probeExpr(fact, factKey)), lit(false))
    fact
      .where(!maybe)
      .unionByName(
        fact.where(maybe)
          .join(keyFrame, fact(factKey) === keyFrame(keyCol), "left_anti"))
  }
}
