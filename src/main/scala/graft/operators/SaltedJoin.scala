package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (large) side into `salts`
  * sub-keys and replicate the small side once per salt, so one hot key
  * spreads over `salts` reducers instead of stalling a single task.
  *
  * Spark's AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) already splits skewed partitions at runtime for sort-merge
  * joins; this helper is the explicit form for the cases AQE doesn't
  * cover — broadcast-ineligible small sides, deterministic pre-planned
  * pipelines, or pre-AQE engines. The salt is derived from row content
  * (hash of discriminator columns), not randomness, so results and
  * partitioning are reproducible.
  */
object SaltedJoin {

  /** Inner-join `large` with `small` on `key`, spreading each `large`-side
    * key over `salts` sub-keys. `discriminators` pick the salt per large
    * row (any columns; they only need to vary within a hot key). */
  def join(large: DataFrame, small: DataFrame, key: String, salts: Int,
      discriminators: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = large.withColumn("_salt", pmod(hash(discriminators: _*), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
