package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash signatures + LSH banding for near-duplicate detection at
  * scale, plus SimHash. All pure column expressions (xxhash64 + HOFs),
  * no UDFs.
  *
  * The scalable near-dup pipeline is:
  *   shingles → minhash signature (k hashes) → band keys → equijoin on
  *   (band, bandHash) to get candidates → exact Jaccard on candidates.
  * This replaces the O(N²) all-pairs shingle join with a shuffle whose
  * size is O(N · bands) and whose join keys are uniformly distributed —
  * the only near-dup shape that survives 100 TB.
  *
  * Determinism: xxhash64 is a fixed algorithm with a fixed seed per
  * hash function, so signatures are stable across runs and clusters.
  */
object MinHash {

  /** k-function MinHash signature of a string-set column.
    * `minhash_i(S) = min over s∈S of xxhash64(i, s)`; an empty set
    * yields an EMPTY array (not k nulls — `array_min([])` is null, and
    * k-null signatures would silently band-collide every empty doc
    * with every other), so `size(sig) > 0` filters work as documented.
    */
  def signature(shingles: Column, k: Int): Column =
    when(
      size(shingles) > 0,
      array((0 until k).map { i =>
        array_min(transform(shingles, s => xxhash64(lit(i), s)))
      }: _*),
    ).otherwise(array().cast("array<bigint>"))

  /** LSH band keys: the signature split into `bands` rows-per-band
    * groups, each band hashed to one long. Two docs share a band key
    * with probability ≈ jaccard^rowsPerBand, amplified over bands.
    * Returns `array<struct<band:int, key:bigint>>` ready to explode.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val bandSlice = slice(sig, b * rowsPerBand + 1, rowsPerBand)
      struct(
        lit(b).as("band"),
        xxhash64(concat_ws(",", transform(bandSlice, _.cast("string")))).as("key"),
      )
    }: _*)

  /** Estimated Jaccard from two equal-length signatures: fraction of
    * agreeing components.
    */
  def estimateJaccard(sigA: Column, sigB: Column): Column =
    when(size(sigA) > 0,
      size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x)).cast("double") / size(sigA))
      .otherwise(lit(0.0))

  /** 64-bit SimHash over a token array: per-token xxhash64, sum ±1 per
    * bit position, sign → bit. Hamming-close simhashes ⇒ similar token
    * multisets. Computed bit-serially with HOFs.
    */
  def simHash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    (0 until 64).map { bit =>
      val votes = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << bit)) =!= 0L, 1L).otherwise(-1L),
      )
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("int")

  // ------------------------------------------------------------------
  // Portable (cross-engine) variants. xxhash64 exists only in Spark;
  // md5 is bit-identical in every engine, which upgrades the MinHash /
  // SimHash queries from property-pinned to DuckDB-hash-pinned. The
  // 60-bit value is the first 15 md5 hex chars — 15 because 16 would
  // need unsigned 64-bit parsing that signed BIGINT engines disagree
  // on, and 60 bits lose nothing for min-hashing or bit votes. At
  // 100 TB swap `portableHash60` back to xxhash64 (same plan shape,
  // ~3× cheaper per hash); the hash CHOICE is semantically free —
  // that is exactly what makes the portable form a valid oracle.
  // ------------------------------------------------------------------

  /** First 60 bits of md5, as a non-negative long. DuckDB mirror:
    * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`.
    */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Top 48 bits of [[portableHash60]], via a bit shift (NOT `divide`
    * — double division loses exactness above 2⁵³; the operand is
    * non-negative so >>12 ≡ //4096). 48 bits because the KMV
    * cardinality estimate (k−1)·2⁴⁸ div h₍ₖ₎ must keep its numerator
    * inside int64 in EVERY engine (255·2⁴⁸ ≈ 7.2e16 < 2⁶³). DuckDB
    * mirror: `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) // 4096`.
    * Used by the KMV sketches (graft.ops.SketchQueries,
    * graft.streaming.StreamingKmvReach).
    */
  def portableHash48(c: Column): Column = shiftright(portableHash60(c), 12)

  /** Mersenne prime 2³¹−1: the Carter–Wegman modulus. 31 bits — not
    * 61 — deliberately: a,b,h mod p < 2³¹ keeps every product under
    * 2⁶² so BOTH engines evaluate (a·h + b) mod p in plain BIGINT
    * (DuckDB ERRORS on BIGINT overflow rather than wrapping, and
    * Spark's exact alternative is DECIMAL(38,0) arithmetic — measured
    * 15× slower than long ops on the shingle×64 hot path). 31-bit
    * min-hashes are the classic construction; the rare within-doc
    * collision perturbs both engines IDENTICALLY, so oracle exactness
    * is untouched and the recall property stays spec-pinned.
    */
  val MersenneP: Long = (1L << 31) - 1

  /** Per-function universal-hash constants, derived from md5 so SQL
    * oracles regenerate them verbatim: aᵢ = md5₆₀("a|i") mod (p−1) + 1
    * (nonzero), bᵢ = md5₆₀("b|i") mod p.
    */
  def cwConstants(i: Int): (Long, Long) = {
    def md5_60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    (md5_60(s"a|$i") % (MersenneP - 1) + 1, md5_60(s"b|$i") % MersenneP)
  }

  /** The i-th universal rehash of a 60-bit base hash:
    * (aᵢ·(h mod p) + bᵢ) mod p, p = 2³¹−1, exact in long arithmetic.
    * A cleaner MinHash family than per-function string hashing
    * (Carter–Wegman 2-universality is what Broder's estimate analysis
    * assumes).
    */
  def cwRehash(h: Column, i: Int): Column = {
    val (a, b) = cwConstants(i)
    ((h % lit(MersenneP)) * lit(a) + lit(b)) % lit(MersenneP)
  }

  /** 60-bit SimHash over a token array with the portable hash: same
    * vote construction as [[simHash]], bits 0–59.
    */
  def simHashPortable(tokens: Column): Column = {
    val hashes = transform(tokens, t => portableHash60(t))
    (0 until 60).map { bit =>
      val votes = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << bit)) =!= 0L, 1L).otherwise(-1L),
      )
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }
}
