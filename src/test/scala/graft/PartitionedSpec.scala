package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Partitioned

/** q30: hive-partitioned fact staging + both pruning modes. The oracle
  * gate proves value parity on the raw table; these specs prove the
  * PLAN properties the layout exists for. */
class PartitionedSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("q30 equals the direct year/quarter filter on raw orders") {
    val got = Partitioned.q30DppJoin(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === Partitioned.DppYear &&
        quarter(col("o_orderdate")) === Partitioned.DppQuarter)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        graft.operators.Exact.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("q30 executed plan prunes fact partitions DYNAMICALLY (DPP subquery present)") {
    val df = Partitioned.q30DppJoin(s, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruning expression in the fact scan's PartitionFilters:\n$plan")
  }

  test("q42 executed plan carries the injected bloom filter; disabling " +
      "it changes nothing in the result") {
    val planDf = Partitioned.withBloomConfs(s) {
      val d = Partitioned.q42Plan(s, dir)
      d.collect()
      d
    }
    val plan = planDf.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloomfilter"),
      s"no bloom_filter_might_contain on the fact scan:\n$plan")
    // semantics: bloom pruning is a pure no-op on results
    val withBloom = Partitioned.q42BloomJoin(s, dir).collect().toSeq
    val withoutKey = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val saved = s.conf.get(withoutKey, "true")
    s.conf.set(withoutKey, "false")
    val without =
      try Partitioned.q42Plan(s, dir).collect().toSeq
      finally s.conf.set(withoutKey, saved)
    assert(withBloom == without, "bloom filter must not change the join")
    assert(withBloom.nonEmpty)
  }

  test("static partition pruning reads exactly one directory for one month") {
    val (ft, _) = Partitioned.ensureTables(s, dir)
    val all = s.table(ft).select("o_ym").distinct().count()
    assert(all > 10, s"expected many month partitions, got $all")
    val files = s.table(ft).filter(col("o_ym") === lit("1995-03"))
      .select(input_file_name()).distinct().count()
    assert(files == 1,
      s"one-month filter read $files files — pruning did not reach the listing")
  }

  test("dynamic partition overwrite replaces only the loaded month; re-runs are idempotent") {
    import graft.sources.Sources
    val table = "graft_ppart_incr_spec"
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    s.sql(s"DROP TABLE IF EXISTS $table")
    val base = Tables.orders(s, dir)
      .withColumn("o_ym", date_format(col("o_orderdate"), "yyyy-MM"))
      .select("o_orderkey", "o_totalprice", "o_ym")
    Sources.writePartitioned(base, table, "o_ym")
    val month = s.table(table).select("o_ym").orderBy("o_ym").head.getString(0)
    val before = s.table(table).count()
    val otherSumBefore = s.table(table).filter(col("o_ym") =!= month)
      .agg(sum("o_totalprice")).head.getDouble(0)

    // incremental load: this month's rows re-priced — only its
    // directory may change
    val load = base.filter(col("o_ym") === month)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Sources.overwritePartitions(load, table, "o_ym")
    assert(s.table(table).count() == before)
    val otherSumAfter = s.table(table).filter(col("o_ym") =!= month)
      .agg(sum("o_totalprice")).head.getDouble(0)
    assert(otherSumAfter == otherSumBefore, "untouched months must not change")
    val monthSum = s.table(table).filter(col("o_ym") === month)
      .agg(sum("o_totalprice")).head.getDouble(0)

    // idempotent re-run: same load, same table state
    Sources.overwritePartitions(load, table, "o_ym")
    assert(s.table(table).count() == before)
    assert(s.table(table).filter(col("o_ym") === month)
      .agg(sum("o_totalprice")).head.getDouble(0) == monthSum)
  }

  test("partitioned layout lands one file per directory (small-files guard)") {
    val (ft, _) = Partitioned.ensureTables(s, dir)
    val perDir = s.table(ft)
      .select(col("o_ym"), input_file_name().as("f")).distinct()
      .groupBy("o_ym").agg(count(lit(1)).as("nf"))
      .agg(max("nf")).head.getLong(0)
    assert(perDir == 1, s"a partition directory holds $perDir files")
  }
}
