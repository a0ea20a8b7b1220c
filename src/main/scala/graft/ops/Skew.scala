package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
