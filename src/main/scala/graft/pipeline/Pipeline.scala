package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-pipeline orchestration with the reference's Luigi/Airflow task
  * semantics (luigi/taxi_data_import.py, luigi/top_10_question_tags.py,
  * airflow/dags/twitter_airflow.py), re-expressed Spark-first:
  *
  *  - a task = a DataFrame transform + a parquet output target;
  *  - `requires` declares upstream tasks (Luigi `requires()`);
  *  - a task is complete iff its target exists (Luigi `Target.exists()`),
  *    so re-running a pipeline only builds what's missing — idempotent
  *    re-runs, the property the reference gets from Luigi and emulates in
  *    airflow's csv_to_sqlite dedup;
  *  - outputs commit atomically (write to a scratch dir, rename into
  *    place) so a killed run never leaves a half-written target that a
  *    re-run would mistake for complete.
  *
  * Unlike Luigi's worker pool, execution here is just topological order
  * on the driver — the parallelism that matters lives INSIDE each task's
  * Spark job (cluster-wide), not in running Python tasks side by side.
  */
abstract class Task {
  def name: String
  def requires: Seq[Task] = Seq.empty
  /** Target path (a parquet directory). */
  def output: String
  /** The transform. Upstream outputs are read back from their targets so
    * each task is independently re-runnable and the DAG can resume. */
  def build(spark: SparkSession): DataFrame

  final def complete: Boolean = Files.exists(Paths.get(output, "_SUCCESS"))

  /** Read this task's materialized output (for downstream tasks). */
  final def read(spark: SparkSession): DataFrame = spark.read.parquet(output)

  final def run(spark: SparkSession): Unit = {
    val target = Paths.get(output)
    val scratch = Paths.get(output + ".inprogress-" + UUID.randomUUID())
    build(spark).write.mode("overwrite").parquet(scratch.toString)
    // atomic publish: a target either doesn't exist or is fully written
    if (Files.exists(target)) {
      // a concurrent/previous run won the race; keep its output
      delete(scratch)
    } else {
      Files.move(scratch, target, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def delete(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(delete)
    Files.deleteIfExists(p)
  }
}

object Pipeline {
  /** Run every incomplete task reachable from `targets`, upstream-first.
    * Returns the names of the tasks that actually ran (complete tasks
    * are skipped — Luigi's "only build what's missing"). */
  def run(spark: SparkSession, targets: Seq[Task]): Seq[String] = {
    val order = topoSort(targets)
    order.filterNot(_.complete).map { t => t.run(spark); t.name }
  }

  /** Upstream-first topological order over the task DAG; cycles are a
    * definition error and throw. */
  def topoSort(targets: Seq[Task]): Seq[Task] = {
    val out = scala.collection.mutable.ListBuffer.empty[Task]
    val done = scala.collection.mutable.Set.empty[String]
    val inProgress = scala.collection.mutable.Set.empty[String]
    def visit(t: Task): Unit = {
      if (done.contains(t.name)) return
      require(!inProgress.contains(t.name),
        s"pipeline cycle through task '${t.name}'")
      inProgress += t.name
      t.requires.foreach(visit)
      inProgress -= t.name
      done += t.name
      out += t
    }
    targets.foreach(visit)
    out.toList
  }
}
