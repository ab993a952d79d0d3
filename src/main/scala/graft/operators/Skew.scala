package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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

  /** q25: the salted join in the correctness gate. Clicks (large, with
    * whatever per-user skew the data has) join a purchases-per-user dim
    * (small) through [[saltedJoin]]; the DuckDB oracle is the PLAIN
    * join + aggregate, proving salting is semantically transparent —
    * only the task-level distribution differs. */
  def q25SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "value")
    val purchasers = e.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purch"))
    saltedJoin(clicks, purchasers, "user_id", salt = 8)
      .groupBy("n_purch")
      .agg(count(lit(1)).as("n_clicks"),
        Exact.dsum(col("value")).as("click_value"))
      .orderBy("n_purch")
  }

  val oracle: Map[String, String] = Map(
    "q25_salted_join" ->
      s"""WITH p AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_purch
         |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         |c AS (SELECT user_id, value FROM events
         |      WHERE event_type = 'click')
         |SELECT n_purch, CAST(count(*) AS BIGINT) AS n_clicks,
         |  ${Exact.sqlDsum("value")} AS click_value
         |FROM c JOIN p USING (user_id)
         |GROUP BY n_purch ORDER BY n_purch""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_salted_join" -> q25SaltedJoin,
  )
}
