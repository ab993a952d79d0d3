package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Zorder

class ZorderSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("c14 layout preserves every order row exactly once") {
    val t = s.read.parquet(s"${Zorder.layoutPath(s, dir)}/table")
    val got = t.agg(count(lit(1)), sum("o_orderkey")).head()
    val want = Tables.orders(s, dir)
      .agg(count(lit(1)), sum("o_orderkey")).head()
    assert(got == want, "row count + key checksum")
    assert(t.select("o_orderkey").distinct().count() == want.getLong(0),
      "no duplicated keys")
  }

  test("c14 skip decision is COMPLETE (every box row lives in a hit " +
      "bucket) and the pruned scan equals the full scan") {
    val audit = Zorder.c14ZorderLayout(s, dir).collect()
    val hitBuckets = audit.filter(_.getInt(7) == 1).map(_.getInt(0)).toSet
    val t = s.read.parquet(s"${Zorder.layoutPath(s, dir)}/table")
    val boxPred = col("ckb").between(Zorder.BoxLo, Zorder.BoxHi) &&
      col("dayb").between(Zorder.BoxLo, Zorder.BoxHi)
    // completeness: no box row outside the hit buckets
    val escapes = t.filter(boxPred &&
      !col("zbucket").isin(hitBuckets.toSeq.map(Integer.valueOf): _*))
    assert(escapes.count() == 0, "min/max screen must never skip a match")
    // the pruned scan (the production read) returns the same rows
    val pruned = t
      .filter(col("zbucket").isin(hitBuckets.toSeq.map(Integer.valueOf): _*))
      .filter(boxPred)
    val full = t.filter(boxPred)
    assert(pruned.agg(count(lit(1)), sum("o_orderkey")).head() ==
      full.agg(count(lit(1)), sum("o_orderkey")).head())
    // and it is partition-pruned at the scan, not post-filtered
    import org.apache.spark.sql.execution.FileSourceScanExec
    pruned.collect()
    val scan = TestSpark.flattenPlan(pruned.queryExecution.executedPlan)
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.partitionFilters.nonEmpty, "zbucket partition filter")
  }

  test("c14 z-order box scan touches structurally fewer buckets than a " +
      "single-column layout of the same file count") {
    val audit = Zorder.c14ZorderLayout(s, dir).collect()
    val zHits = audit.count(_.getInt(7) == 1)
    // the linear alternative: same 64 buckets, keyed by ckb alone —
    // what a plain ORDER BY o_custkey layout gives the scan planner
    val t = s.read.parquet(s"${Zorder.layoutPath(s, dir)}/table")
    val lin = t.groupBy(expr("ckb div 4").as("bk"))
      .agg(min("ckb").as("a"), max("ckb").as("b"),
        min("dayb").as("c"), max("dayb").as("d"))
      .filter(col("a") <= Zorder.BoxHi && col("b") >= Zorder.BoxLo &&
        col("c") <= Zorder.BoxHi && col("d") >= Zorder.BoxLo)
    val linHits = lin.count()
    assert(zHits < linHits,
      s"z-order must out-skip the 1-D layout: z=$zHits linear=$linHits")
    assert(zHits <= 12, s"2-D box (30% per dim) should hit ~9/64: $zHits")
  }
}
