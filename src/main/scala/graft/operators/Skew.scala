package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join splitting (on in GraftSession) handles most skew at
  * runtime by splitting oversized shuffle partitions. Salting is the
  * static escape hatch for the pathological case AQE can't fix: ONE key
  * so hot that any single task owning it is the straggler — the
  * power-law user in an events table, the empty-string key, the null
  * surrogate.
  *
  * `saltedJoin` explodes the small side `salt` ways and scatters the
  * large side's rows uniformly across the salt space, so the hot key's
  * rows land on `salt` tasks instead of one. Cost: the small side is
  * replicated `salt`× — use for dimension-ish right sides, not
  * fact-fact.
  */
object Skew {

  /** Inner equi-join of `large` and `small` on `key`, with the hot-key
    * load spread over `salt` partitions per key. Result equals
    * `large.join(small, key)` exactly; only the distribution differs. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // large side: uniform deterministic salt derived from a per-row hash
    // (monotonically_increasing_id is partition-stable; xxhash64 scatters)
    val saltedLarge = large.withColumn(
      "__salt", pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)))
    // small side: replicate each row across the whole salt space
    val saltedSmall = small.withColumn(
      "__salt", explode(array((0 until salt).map(lit): _*)))
    saltedLarge.join(saltedSmall,
        saltedLarge(key) === saltedSmall(key) &&
          saltedLarge("__salt") === saltedSmall("__salt"))
      .drop(saltedSmall(key)).drop("__salt")
  }
}
