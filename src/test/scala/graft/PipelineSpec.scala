package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Pipeline, Task}

/** The reference's Luigi taxi ETL shape as a three-task DAG:
  * ingest → enrich (join) → report (agg), with idempotent re-runs. */
class PipelineSpec extends AnyFunSuite {

  private def mkDag(root: String): (Task, Task, Task) = {
    val ingest = new Task {
      val name = "ingest_orders"
      val output = s"$root/orders_typed"
      def build(s: SparkSession): DataFrame =
        Tables.orders(s, TestSpark.SfDir)
          .select("o_orderkey", "o_custkey", "o_totalprice")
    }
    val enrich = new Task {
      val name = "enrich_orders"
      override val requires = Seq(ingest)
      val output = s"$root/orders_enriched"
      def build(s: SparkSession): DataFrame =
        ingest.read(s).join(
          broadcast(Tables.customer(s, TestSpark.SfDir)
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
    }
    val report = new Task {
      val name = "nation_report"
      override val requires = Seq(enrich)
      val output = s"$root/nation_report"
      def build(s: SparkSession): DataFrame =
        enrich.read(s).groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("revenue"))
    }
    (ingest, enrich, report)
  }

  test("DAG runs upstream-first, materializes targets, re-run is a no-op") {
    val s = TestSpark.spark
    val root = Files.createTempDirectory("graft_pipe").toString
    val (_, _, report) = mkDag(root)

    val ran = Pipeline.run(s, Seq(report))
    assert(ran === Seq("ingest_orders", "enrich_orders", "nation_report"))
    assert(report.read(s).count() === 25) // one row per nation

    // idempotent: everything complete, nothing runs
    assert(Pipeline.run(s, Seq(report)) === Seq.empty)

    // partial resume: delete the tail target, only it rebuilds
    val (_, _, report2) = mkDag(root)
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rm); p.delete()
    }
    rm(new java.io.File(report2.output))
    assert(Pipeline.run(s, Seq(report2)) === Seq("nation_report"))
  }

  test("cycles are rejected") {
    lazy val a: Task = new Task {
      val name = "a"; val output = "/tmp/never_a"
      override def requires = Seq(b)
      def build(s: SparkSession): DataFrame = ???
    }
    lazy val b: Task = new Task {
      val name = "b"; val output = "/tmp/never_b"
      override def requires = Seq(a)
      def build(s: SparkSession): DataFrame = ???
    }
    assertThrows[IllegalArgumentException](Pipeline.topoSort(Seq(a)))
  }
}
