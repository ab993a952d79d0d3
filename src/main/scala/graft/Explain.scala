package graft

import java.nio.file.{Files, Paths}

/** Plan-audit main: dumps `explain("formatted")` for every SparkEntry
  * query to one file (default PLANS.txt), plus a per-query one-line
  * summary of the properties that matter at scale — whether filters
  * reached the scan (PushedFilters), how many columns the scan reads
  * (ReadSchema), the join strategies chosen, and the number of
  * exchanges (shuffles) in the physical plan.
  *
  * Usage: sbt "runMain graft.Explain [sfDir] [outFile]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.txt"
    val spark = GraftSession.get()

    val sb = new StringBuilder
    val summary = new StringBuilder
    summary.append("query | shuffles | joins | pushed | readCols\n")

    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      sb.append(s"===== $name =====\n$plan\n")
      val lines = plan.linesIterator.toSeq
      val shuffles = lines.count(_.contains("Exchange hashpartitioning")) +
        lines.count(_.contains("Exchange rangepartitioning"))
      val joins = lines.filter(_.contains("Join")).map(_.trim.split(" ")(1))
        .mkString("+")
      val pushed = lines.exists(l =>
        l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
      val readCols = lines.filter(_.contains("ReadSchema"))
        .map(l => l.substring(l.indexOf("ReadSchema")).count(_ == ':') - 1)
        .mkString(",")
      summary.append(s"$name | $shuffles | $joins | $pushed | $readCols\n")
    }
    Files.write(Paths.get(out), (summary.toString + "\n" + sb.toString).getBytes)
    println(s"[explain] wrote $out")
    println(summary.toString)
    spark.stop()
  }
}
