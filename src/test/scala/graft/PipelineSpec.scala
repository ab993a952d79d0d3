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

  test("a transiently-failing task succeeds on retry and the DAG completes") {
    val s = TestSpark.spark
    val root = Files.createTempDirectory("graft_pipe_retry").toString
    var attempts = 0
    val flaky = new Task {
      val name = "flaky_ingest"
      val output = s"$root/flaky"
      override def retries = 2
      override def retryBackoffMs = 1L
      def build(sp: SparkSession): DataFrame = {
        attempts += 1
        if (attempts < 3) throw new RuntimeException("transient fetch error")
        Tables.region(sp, TestSpark.SfDir)
      }
    }
    val report = Pipeline.runReport(s, Seq(flaky))
    assert(report.ok)
    assert(report.ran === Seq("flaky_ingest"))
    assert(attempts === 3)
    assert(flaky.read(s).count() === 5)
  }

  test("per-task metrics record attempts, wall time, and rows written") {
    val s = TestSpark.spark
    val root = Files.createTempDirectory("graft_pipe_metrics").toString
    var attempts = 0
    val flaky = new Task {
      val name = "flaky"
      val output = s"$root/flaky"
      override def retries = 2
      override def retryBackoffMs = 1L
      def build(sp: SparkSession): DataFrame = {
        attempts += 1
        if (attempts < 2) throw new RuntimeException("transient")
        Tables.region(sp, TestSpark.SfDir)
      }
    }
    val dead = new Task {
      val name = "dead"
      val output = s"$root/dead"
      override def retries = 1
      override def retryBackoffMs = 1L
      def build(sp: SparkSession): DataFrame =
        throw new RuntimeException("permanent")
    }
    val report = Pipeline.runReport(s, Seq(flaky, dead))
    val fm = report.metrics("flaky")
    assert(fm.attempts === 2)     // one failure + the success
    assert(fm.rowsWritten === 5)  // region has 5 rows, counted in-write
    assert(fm.wallMs >= 0)
    val dm = report.metrics("dead")
    assert(dm.attempts === 2)     // retries exhausted
    assert(dm.rowsWritten === 0)
    // skipped / never-attempted tasks have no stats
    assert(report.metrics.keySet === Set("flaky", "dead"))
  }

  test("SubDag instantiates one definition twice with disjoint names and targets") {
    val s = TestSpark.spark
    val root = Files.createTempDirectory("graft_subdag").toString
    def define(prefix: String): graft.pipeline.SubDag = {
      val sd = new graft.pipeline.SubDag(prefix, root)
      val ingest = sd.task("ingest") { (sp, _) =>
        Tables.region(sp, TestSpark.SfDir).select("r_regionkey", "r_name")
      }
      sd.task("report", deps = Seq(ingest)) { (_, deps) =>
        deps.head.groupBy("r_name").agg(count(lit(1)).as("n"))
      }
      sd
    }
    val a = define("runA")
    val b = define("runB")
    assert(a.tasks.map(_.name) === Seq("runA.ingest", "runA.report"))
    assert(b.tasks.map(_.name) === Seq("runB.ingest", "runB.report"))
    assert(a.tasks.map(_.output).toSet.intersect(
      b.tasks.map(_.output).toSet).isEmpty)
    val report = Pipeline.runReport(s, a.tasks ++ b.tasks)
    assert(report.ok)
    assert(report.ran.toSet ===
      Set("runA.ingest", "runA.report", "runB.ingest", "runB.report"))
    assert(a.tasks.last.read(s).count() === 5)
    assert(b.tasks.last.read(s).count() === 5)
  }

  test("a permanently-failing leaf skips its dependents; siblings still build") {
    val s = TestSpark.spark
    val root = Files.createTempDirectory("graft_pipe_fail").toString
    val bad = new Task {
      val name = "bad"
      val output = s"$root/bad"
      def build(sp: SparkSession): DataFrame =
        throw new RuntimeException("permanent")
    }
    val badChild = new Task {
      val name = "bad_child"
      override val requires = Seq(bad)
      val output = s"$root/bad_child"
      def build(sp: SparkSession): DataFrame = bad.read(sp)
    }
    val good = new Task {
      val name = "good"
      val output = s"$root/good"
      def build(sp: SparkSession): DataFrame = Tables.nation(sp, TestSpark.SfDir)
    }
    val report = Pipeline.runReport(s, Seq(badChild, good))
    assert(report.failed.keySet === Set("bad"))
    assert(report.skipped === Seq("bad_child"))
    assert(report.ran === Seq("good"))
    assert(good.complete(s) && !bad.complete(s) && !badChild.complete(s))
    assert(good.read(s).count() === 25)
  }

  test("backfill builds disjoint date partitions; re-running a past date is a no-op") {
    val s = TestSpark.spark
    val base = Files.createTempDirectory("graft_pipe_dates").toString + "/daily"
    def mk(d: java.time.LocalDate): Seq[Task] = Seq(new pipeline.DatedTask(d) {
      val name = s"daily_orders_$d"
      def baseOutput: String = base
      def build(sp: SparkSession): DataFrame =
        Tables.orders(sp, TestSpark.SfDir)
          .limit(10).withColumn("run_date", lit(d.toString))
    })
    val dates = pipeline.Schedule.dailyDates(
      java.time.LocalDate.parse("2024-01-01"),
      java.time.LocalDate.parse("2024-01-03"))
    assert(dates.map(_.toString) === Seq("2024-01-01", "2024-01-02"))
    val first = pipeline.Schedule.backfill(s, dates, mk)
    assert(first.values.forall(r => r.ok && r.ran.size === 1))
    val parts = dates.map(d => s.read.parquet(s"$base/dt=$d"))
    assert(parts.map(_.count()) === Seq(10L, 10L))
    assert(parts.zip(dates).forall { case (df, d) =>
      df.select("run_date").distinct().collect().map(_.getString(0))
        .sameElements(Array(d.toString))
    })
    // catch-up over the same window: everything complete, nothing runs
    val second = pipeline.Schedule.backfill(s, dates, mk)
    assert(second.values.forall(r => r.ok && r.ran.isEmpty))
  }

  test("a crashed publish (data files, no marker) is incomplete and rebuilds") {
    val s = TestSpark.spark
    val root = Files.createTempDirectory("graft_pipe_crash").toString
    def mkTask() = new Task {
      val name = "crashy"
      val output = s"$root/crashy"
      def build(sp: SparkSession): DataFrame = Tables.region(sp, TestSpark.SfDir)
    }
    val t = mkTask()
    assert(Pipeline.run(s, Seq(t)) === Seq("crashy"))
    assert(t.complete(s))
    // simulate a crash that wrote data but never committed: delete ONLY
    // the marker — Spark's own _SUCCESS and the parquet files remain
    val fs = t.markerPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(t.markerPath, false)
    assert(!t.complete(s), "data files without a marker must read as incomplete")
    assert(new java.io.File(t.output, "_SUCCESS").exists,
      "precondition: Spark's _SUCCESS alone must not imply completeness")
    // re-run rebuilds and recommits
    val t2 = mkTask()
    assert(Pipeline.run(s, Seq(t2)) === Seq("crashy"))
    assert(t2.complete(s) && t2.read(s).count() === 5)
  }

  test("report distribution: c4_report renders to a deterministic text " +
      "artifact through the atomic-publish path; re-run is a no-op") {
    import graft.pipeline.{Reports, TextReportTask}
    val s = TestSpark.spark
    val root = Files.createTempDirectory("graft_report").toString
    val task = Reports.curationReportTask(TestSpark.SfDir, root)

    assert(Pipeline.run(s, Seq(task)) === Seq("curation_report"))
    assert(task.complete(s), "report target not committed")
    val body = TextReportTask.readBody(s, task.output)
    // the rendered body carries both report sections with real content
    assert(body.startsWith("Subject: corpus curation report\n"))
    for (stage <- Seq("bench_holdout", "quality_floor", "cluster_dedup",
        "decontaminate", "source_cap"))
      assert(body.contains(stage), s"missing lineage stage $stage")
    assert(body.contains("Top links"), "missing q9 section")
    assert(body.linesIterator.count(_.matches("^\\d\\. .*\\(\\d+\\)$")) == 5,
      "expected exactly 5 top-link lines")

    // idempotent: complete target ⇒ nothing runs, bytes untouched
    assert(Pipeline.run(s, Seq(task)) === Seq.empty)
    assert(TextReportTask.readBody(s, task.output) == body)

    // deterministic republication: drop the marker (crash debris shape)
    // and the rebuilt body is byte-identical
    val fs = task.markerPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(task.markerPath, false)
    assert(Pipeline.run(s, Seq(task)) === Seq("curation_report"))
    assert(TextReportTask.readBody(s, task.output) == body,
      "re-rendered report body not byte-identical")
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
