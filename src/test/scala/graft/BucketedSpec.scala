package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketed

class BucketedSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    TestSpark.flattenPlan(p)

  test("q23 joins bucketed tables with zero exchanges below the join") {
    val df = Bucketed.q23BucketedJoin(s, dir)
    val rows = df.collect() // materialize so AQE settles the final plan
    assert(rows.nonEmpty)
    val all = flatten(df.queryExecution.executedPlan)
    val smj = all.collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty,
      s"expected a sort-merge join:\n${df.queryExecution.executedPlan}")
    val shuffles = flatten(smj.get).drop(1).collect {
      case e: ShuffleExchangeLike => e
      case q: ShuffleQueryStageExec => q
    }
    assert(shuffles.isEmpty,
      s"bucketed join subtree must not shuffle:\n${smj.get}")
  }

  test("q23 equals the same join+agg on the raw tables") {
    import org.apache.spark.sql.functions._
    val got = Bucketed.q23BucketedJoin(s, dir).collect()
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val exp = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderstatus", "l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        graft.operators.Exact.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderstatus", "l_returnflag")
      .collect()
    assert(got.toSeq === exp.toSeq)
  }
}
