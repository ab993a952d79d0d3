package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("every relational query runs and returns rows") {
    Relational.queries.foreach { case (name, fn) =>
      assert(fn(s, dir).count() > 0, s"$name returned no rows")
    }
  }

  test("q1 groups by (returnflag, linestatus) with sane aggregates") {
    val rows = Relational.q1MultiAgg(s, dir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (mn, mx, avg, med) = (r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7))
      assert(mn <= med && med <= mx && mn <= avg && avg <= mx)
    }
  }

  test("q4 is sorted descending by acctbal, k=10") {
    val bals = Relational.q4SortTopk(s, dir).collect().map(_.getDouble(2))
    assert(bals.length == 10)
    assert(bals.sameElements(bals.sortBy(-_)))
  }

  test("q13 word counts sum to the corpus token total") {
    import org.apache.spark.sql.functions._
    val total = Tables.documents(s, dir)
      .select(size(expr("filter(split(text, ' '), t -> t <> '')")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val counted = Relational.q13Wordcount(s, dir)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(counted == total)
  }

  test("q17 keeps only the trailing day") {
    import org.apache.spark.sql.functions._
    val e = Tables.events(s, dir)
    val maxTs = e.agg(max("ts")).collect()(0).getTimestamp(0)
    val cnt = Relational.q17TimeRangeFilter(s, dir)
      .agg(sum("cnt")).collect()(0).getLong(0)
    val expected = e.filter(
      col("ts") > lit(maxTs) - expr("INTERVAL 1 DAY")).count()
    assert(cnt == expected)
  }

  test("q19 pivot row sums equal hourly event counts") {
    import org.apache.spark.sql.functions._
    val p = Relational.q19PivotAgg(s, dir)
      .withColumn("total",
        col("click") + col("error") + col("purchase") + col("signup") + col("view"))
    val byHour = Tables.events(s, dir)
      .groupBy(hour(col("ts")).as("hr")).count()
    val joined = p.join(byHour, "hr")
      .filter(col("total") =!= col("count")).count()
    assert(joined == 0)
  }
}
