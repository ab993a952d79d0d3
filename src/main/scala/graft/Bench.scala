package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds.
  *
  * Each query is fully materialized through the `noop` sink (forces every
  * operator, unlike count() which lets Catalyst prune work). One untimed
  * warmup of the flagship query absorbs JVM/codegen startup so numbers
  * reflect steady-state throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    /** Untimed inter-query cleanup: drop cached relations and collect the
      * previous query's broadcast/codegen garbage so one query's GC debt
      * doesn't land in the next query's wall time. */
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }

    run("q1_multi_agg") // warmup, untimed

    // two timed runs per query, report the min: the first run carries
    // codegen compilation + file-listing costs that a steady-state
    // workload doesn't pay
    val names = SparkEntry.queries.keys.toSeq.sorted
    // a query is "failed" if ANY of its runs failed — a transient
    // failure must not hide behind the surviving run's timing, and a
    // persistent one must not silently drop out of the total
    val results = names.map { n =>
      cleanup()
      val a = run(n)
      cleanup()
      val b = run(n)
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val failed = results.collect { case (n, v) if v < 0 => n }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total_wall","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
