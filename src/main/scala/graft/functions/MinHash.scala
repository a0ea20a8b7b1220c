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
}
