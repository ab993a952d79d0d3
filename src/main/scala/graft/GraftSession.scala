package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory with scale-oriented defaults.
  *
  * Settings are chosen for a large cluster and scale down cleanly to
  * local[n]: AQE handles runtime re-planning (coalescing small shuffle
  * partitions, skew-join splitting), broadcast threshold keeps dimension
  * joins shuffle-free, and shuffle.partitions is sized by the caller
  * (32 on the local harness, thousands on a real cluster).
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // Legacy-generation `events` corpora carry INT64(TIMESTAMP(NANOS))
      // which Spark refuses by default; read as long and convert in Tables
      // (a no-op for the current TIMESTAMP(MICROS) generation).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Permissive eval semantics (out-of-range element_at → null, etc.);
      // all graft operators guard their own arithmetic explicitly.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      // bucketed tables (Sources.writeBucketed) land here, not in cwd
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Builder pre-sized for a real cluster instead of local[n].
    *
    * The two knobs that actually matter at 100 TB:
    *  - `spark.sql.shuffle.partitions` ≈ 2–3 tasks per core across the
    *    cluster, floored so the LARGEST shuffle stage's partitions fit
    *    in executor memory: partitions ≥ shuffledBytes / targetPartition
    *    (AQE coalesces the small stages back down, so oversizing is
    *    cheap and undersizing spills — size for the big stage);
    *  - `spark.sql.files.maxPartitionBytes` controls scan-task
    *    granularity; 256 MB halves task-scheduling overhead vs the
    *    128 MB default on long sequential parquet scans while staying
    *    comfortably in memory after column pruning.
    * Everything else (skew splitting, partition coalescing, broadcast
    * planning) is deliberately left to AQE at runtime. */
  def clusterBuilder(executors: Int, coresPerExecutor: Int,
                     largestShuffleGb: Long,
                     warehouseDir: String,
                     targetPartitionMb: Int = 128): SparkSession.Builder =
    builder(master = "yarn",
        shufflePartitions = clusterShufflePartitions(
          executors, coresPerExecutor, largestShuffleGb, targetPartitionMb))
      .config("spark.sql.files.maxPartitionBytes",
        (256L * 1024 * 1024).toString)
      // the local builder()'s java.io.tmpdir warehouse would scatter
      // bucketed tables across executor-private /tmp on a real cluster;
      // a cluster session must point at shared durable storage
      .config("spark.sql.warehouse.dir", warehouseDir)

  /** max(3 tasks per core, largest shuffle ÷ target partition size). */
  def clusterShufflePartitions(executors: Int, coresPerExecutor: Int,
                               largestShuffleGb: Long,
                               targetPartitionMb: Int = 128): Int = {
    val byCores = executors.toLong * coresPerExecutor * 3
    val byMemory = (largestShuffleGb * 1024L + targetPartitionMb - 1) /
      targetPartitionMb
    math.max(byCores, byMemory).toInt
  }
}
