package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (most-recent-prior) join — an operator Spark's built-ins don't
  * name, composed from existing ops per the preference order (no custom
  * plan needed): tag both sides, union, and carry the right side forward
  * with one keyed window — a single shuffle on (key), linear in
  * |left| + |right|, versus the naive time-range join's quadratic
  * candidate space. The DuckDB oracle uses its NATIVE `ASOF LEFT JOIN`,
  * so the gate cross-checks this composition against an independent
  * first-class implementation.
  *
  * Demo query q21: attribute each `purchase` event to the same user's
  * most recent prior-or-simultaneous `view` event (the classic
  * attribution shape; reference's stock tasks use the same
  * "latest value as of now" semantics in celery_app/tasks.py:54).
  */
object AsOf {

  /** Generic as-of join: for each row of `left`, the most recent `right`
    * row with the same `key` and `rightTs` <= `leftTs`. `carry` lists the
    * right-side columns to carry onto the left rows (null when no prior
    * right row exists). Both inputs must share the key column name;
    * `tieBreak` orders simultaneous right rows (later wins). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, carry: Seq[String],
               tieBreak: String): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(right.schema(tieBreak).dataType))
    val carryNulls = carry.foldLeft(lTagged) { (df, c) =>
      df.withColumn(s"__c_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rTagged0 = right
      .withColumn("__t", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(tieBreak))
    val rTagged = carry.foldLeft(rTagged0) { (df, c) =>
      df.withColumn(s"__c_$c", col(c))
    }
    val common = Seq(key, "__t", "__side", "__tb") ++ carry.map(c => s"__c_$c")
    val unioned = carryNulls.select(
      (common ++ left.columns.filterNot(common.contains)).map(col): _*)
      .unionByName(
        rTagged.select(common.map(col): _*), allowMissingColumns = true)

    // right rows sort before left rows at the same instant (as-of is
    // inclusive); among simultaneous right rows the larger tieBreak wins
    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carry.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c",
        last(when(col("__side") === 0, col(s"__c_$c")), ignoreNulls = true)
          .over(w))
    }
    val out = carried.filter(col("__side") === 1)
    val renamed = carry.foldLeft(out) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__asof_$c"))
    }
    renamed.select(
      (left.columns.toSeq ++ carry.map(c => s"asof_$c")).map(col): _*)
  }

  /** q21: purchase→last-view attribution over the events table.
    *
    * The right side is pre-deduped to one row per (user, ts) with the
    * max event id as the defined winner: asofJoin's own tie-break is
    * already "larger tieBreak wins", but DuckDB's native ASOF JOIN makes
    * an UNSPECIFIED choice among equal-timestamp matches, so without the
    * pre-dedup the oracle gate could flake on same-user same-microsecond
    * view events. The dedup applies the same winner rule on both engines
    * before the join, making both results defined. */
  def q21AsofAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_event_id"))
    asofJoin(purchases, views, key = "user_id",
        leftTs = "ts", rightTs = "ts",
        carry = Seq("view_event_id"), tieBreak = "view_event_id")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("pts"),
        col("asof_view_event_id").as("view_event_id"))
      .orderBy("event_id")
  }

  /** Range-join bucket width: ±5 minutes, in microseconds. */
  val RangeUs: Long = 5L * 60 * 1000000

  /** q22: range (interval) join — pairs of (error, click) events of the
    * same user within ±5 minutes. Spark plans a raw inequality join as a
    * nested loop; instead both sides bucket to fixed 5-minute bins and
    * the error side probes its bin ±1 — an equi-join on (user, bin) plus
    * a post-filter, linear in events and shuffle-partitioned on the
    * (user, bin) key. The DuckDB oracle is the plain inequality join, so
    * the gate proves the banding loses no pairs. */
  def q22RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).withColumn("tus", unix_micros(col("ts")))
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("tus").as("ets"))
      .withColumn("bin", explode(array(
        (col("ets") / RangeUs).cast("long") - 1,
        (col("ets") / RangeUs).cast("long"),
        (col("ets") / RangeUs).cast("long") + 1)))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("tus").as("cts"))
      .withColumn("bin", (col("cts") / RangeUs).cast("long"))
      .hint("shuffle_hash")
    errors.join(clicks,
        errors("user_id") === clicks("c_user") &&
          errors("bin") === clicks("bin"))
      .filter(abs(col("ets") - col("cts")) <= RangeUs)
      .select(col("error_id"), col("click_id"), col("user_id"),
        (col("cts") - col("ets")).as("delta_us"))
      .distinct() // bin±1 probing can see the same pair twice at edges
      .orderBy("error_id", "click_id")
  }

  val oracle: Map[String, String] = Map(
    "q22_range_join" ->
      s"""SELECT x.event_id AS error_id, y.event_id AS click_id,
         |  x.user_id, epoch_us(y.ts) - epoch_us(x.ts) AS delta_us
         |FROM (SELECT * FROM events WHERE event_type = 'error') x
         |JOIN (SELECT * FROM events WHERE event_type = 'click') y
         |  ON x.user_id = y.user_id
         |  AND abs(epoch_us(x.ts) - epoch_us(y.ts)) <= $RangeUs
         |ORDER BY error_id, click_id""".stripMargin,
    "q21_asof_attribution" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS pts,
        |  v.view_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_asof_attribution" -> q21AsofAttribution,
    "q22_range_join" -> q22RangeJoin,
  )
}
