package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Pin.PinOps

/** Skew-handling join helper. AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin) is the first line of defense and is on
  * by default; explicit salting remains the tool when a single key is
  * hot enough that even split shuffle blocks hammer one reducer key
  * (classic at 100 TB: the null/default customer, the empty-string
  * language, the viral document).
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side gets a
    * deterministic per-row salt in [0, salts); the small side is
    * replicated once per salt value; the join key becomes
    * (keys..., salt). A hot key's rows now spread over `salts` reducer
    * partitions instead of one. Trade-off: the right side shuffles
    * `salts`× its size — use for dimension-sized right sides.
    *
    * The salt derives from a hash of the whole left row (not
    * rand()), so the join stays deterministic and retry-safe — a task
    * retry re-salts identically, which `rand()` does not guarantee.
    */
  def saltedInnerJoin(
      skewedLeft: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
  ): DataFrame = {
    require(salts > 0)
    val saltedL = skewedLeft.withColumn(
      "__salt",
      pmod(xxhash64(struct(skewedLeft.columns.map(col): _*)), lit(salts)).cast("int"),
    )
    val saltedR = right.withColumn("__salt", explode(lit((0 until salts).toArray)))
    saltedL
      .join(saltedR, keys :+ "__salt")
      .drop("__salt")
  }

  // ---------------------------------------------------------------------
  // AUTO-salting (r9): [[saltedInnerJoin]] salts EVERY row and
  // replicates the whole right side `salts`× — the right trade only
  // when most keys are hot. The histogram-driven form below closes the
  // loop q220 opened: the same one-aggregate key profile q220 emits as
  // a REPORT becomes the broadcast plan an operator READS — only keys
  // heavier than `minSaltFactor`× the mean get salted (each by its own
  // ceiling-division factor, q220's formula exactly), and every cold
  // key passes through with salt 0 against an unreplicated right row.
  // Hot-key fan-out and cold-key pass-through are pinned in SkewSpec;
  // the registered q255 proves the whole thing invisible against the
  // plain-join oracle (the q46 proof shape).

  /** The salting plan: hot keys only, as (keys..., __sf). One
    * map-side-combined aggregate over the left (q220's only
    * corpus-sized pass), a 1-row totals anchor broadcast back, factor
    * = ⌈n_key·n_keys/total⌉. `maxHotKeys` bounds the broadcast by
    * construction (deterministic heaviest-first order, ties on keys) —
    * an un-planned hot key is a correctness no-op, it just stays on
    * one reducer; `maxSaltFactor` bounds per-key right-side
    * replication the same way.
    */
  def skewPlan(
      left: DataFrame,
      keys: Seq[String],
      minSaltFactor: Int = 2,
      maxHotKeys: Int = 1000,
      maxSaltFactor: Int = 64,
  ): DataFrame = {
    require(minSaltFactor >= 2 && maxHotKeys > 0 && maxSaltFactor >= minSaltFactor)
    val cnt = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n_rows"))
    val tot = cnt.agg(sum(col("__n_rows")).as("__total"), count(lit(1)).as("__n_keys"))
    cnt
      .join(broadcast(tot))
      // hot ⟺ the key is ≥ minSaltFactor× the mean — cross-multiplied
      // (n_rows·n_keys ≥ f·total), NOT the ceiling factor (which would
      // flag every at-or-above-mean key as hot on near-uniform data);
      // products in DECIMAL(38,0) because n_rows·n_keys passes int64 at
      // warehouse scale (the q147/q227 rule)
      .where(
        expr("cast(__n_rows as decimal(38,0)) * __n_keys") >=
          expr(s"cast(__total as decimal(38,0)) * ${minSaltFactor.toLong}"))
      .select(
        keys.map(col) :+
          least(
            expr("(cast(__n_rows as decimal(38,0)) * __n_keys + __total - 1) div __total"),
            lit(maxSaltFactor.toLong)).as("__sf") :+
          col("__n_rows"): _*)
      .orderBy(col("__n_rows").desc +: keys.map(col): _*)
      .limit(maxHotKeys)
      .drop("__n_rows")
  }

  /** Left side under a plan: hot rows spread over their key's `__sf`
    * sub-keys (whole-row hash — deterministic, retry-safe), cold rows
    * pass through with salt 0.
    */
  private[ops] def saltLeft(left: DataFrame, plan: DataFrame, keys: Seq[String]): DataFrame =
    left
      .join(broadcast(plan), keys, "left")
      .withColumn(
        "__salt",
        when(col("__sf").isNull, lit(0))
          .otherwise(
            pmod(xxhash64(struct(left.columns.map(col): _*)), col("__sf")).cast("int")))
      .drop("__sf")

  /** Right side under a plan: hot keys replicate `__sf`× (one row per
    * salt value), cold keys stay single (salt 0 only) — replication
    * cost ∝ the hot set, never the whole dimension.
    */
  private[ops] def saltRight(right: DataFrame, plan: DataFrame, keys: Seq[String]): DataFrame =
    right
      .join(broadcast(plan), keys, "left")
      .withColumn("__salt", explode(sequence(lit(0), coalesce(col("__sf"), lit(1L)).cast("int") - 1)))
      .drop("__sf")

  /** Inner equi-join that salts ONLY the keys the left's own histogram
    * says are hot. Result ≡ the plain inner join (q255's oracle pins
    * it); the plan costs one extra aggregate over the left — cheap
    * enough to gate every scheduled join at 100 TB, which is exactly
    * how q220 said the profile would be consumed.
    */
  def autoSaltedInnerJoin(
      skewedLeft: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      minSaltFactor: Int = 2,
      maxHotKeys: Int = 1000,
      maxSaltFactor: Int = 64,
  ): DataFrame = {
    val plan = skewPlan(skewedLeft, keys, minSaltFactor, maxHotKeys, maxSaltFactor)
      // read twice (both sides) — never recompute the histogram
      .pinLineage()
    saltLeft(skewedLeft, plan, keys)
      .join(saltRight(right, plan, keys), keys :+ "__salt")
      .drop("__salt")
  }
}
