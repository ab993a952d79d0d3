package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {

  test("asofJoin picks the most recent prior-or-equal right row per key") {
    val s = TestSpark.spark
    import s.implicits._
    val left = Seq(
      (1L, 100L, "p1"), (1L, 200L, "p2"), (1L, 50L, "p0"),
      (2L, 100L, "q1")).toDF("k", "t", "name")
    val right = Seq(
      (1L, 80L, 10L), (1L, 100L, 11L), (1L, 150L, 12L),
      (3L, 10L, 99L)).toDF("k", "t", "rid")

    val out = AsOf.asofJoin(left, right, key = "k",
        leftTs = "t", rightTs = "t", carry = Seq("rid"), tieBreak = "rid")
      .orderBy("k", "t")
      .select("k", "t", "name", "asof_rid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))

    assert(out.toSeq === Seq(
      (1L, 50L, "p0", -1L),   // nothing at or before t=50
      (1L, 100L, "p1", 11L),  // inclusive: right row AT t=100 wins over t=80
      (1L, 200L, "p2", 12L),  // most recent prior is t=150
      (2L, 100L, "q1", -1L))) // key has no right rows at all
  }

  test("q22 banding equals brute force on sf0.001 (inclusive boundaries)") {
    val s = TestSpark.spark
    val banded = AsOf.q22RangeJoin(s, TestSpark.SfDir).collect()
    val e = Tables.events(s, TestSpark.SfDir)
      .withColumn("tus", unix_micros(col("ts")))
    val brute = e.filter(col("event_type") === "error").as("x")
      .crossJoin(e.filter(col("event_type") === "click").as("y"))
      .filter(col("x.user_id") === col("y.user_id") &&
        abs(col("x.tus") - col("y.tus")) <= AsOf.RangeUs)
      .count()
    assert(banded.length.toLong === brute)
  }

  test("q21 attribution runs on the events table with sane coverage") {
    val s = TestSpark.spark
    val out = AsOf.q21AsofAttribution(s, TestSpark.SfDir)
    val rows = out.collect()
    val purchases = Tables.events(s, TestSpark.SfDir)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length.toLong === purchases) // left join: every purchase kept
    // most purchases in a month-long event stream have some prior view
    val attributed = rows.count(!_.isNullAt(3))
    assert(attributed > rows.length / 2)
  }
}
