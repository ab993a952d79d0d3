package graft

import java.nio.file.{Files, Paths}

/** Plan-audit main: dumps the EXECUTED plan (`AdaptiveSparkPlan
  * isFinalPlan=true` — each query is materialized through the noop sink
  * first, so AQE's runtime re-planning and exchange reuse are visible,
  * unlike the static plan which double-counts a self-join's identical
  * subtrees) for every SparkEntry query to one file (default
  * PLANS.txt), plus a per-query one-line summary of the properties that
  * matter at scale — whether filters reached the scan (PushedFilters),
  * how many columns the scan reads (ReadSchema), the join strategies
  * chosen, and the number of exchanges actually executed vs reused.
  *
  * Usage: sbt "runMain graft.Explain [sfDir] [outFile]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.txt"
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    val sb = new StringBuilder
    val summary = new StringBuilder
    summary.append("query | shuffles(exec+reused) | joins | pushed | readCols\n")

    val joinRe = """([A-Za-z]*Join)""".r

    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val df = SparkEntry.queries(name)(spark, dir)
      // drive the DATASET'S OWN QueryExecution to its AQE final plan (a
      // write action builds a separate QueryExecution and leaves df's at
      // isFinalPlan=false) WITHOUT buffering rows on the driver: count()
      // on the internal-row RDD executes the adaptive plan but ships only
      // per-partition counts back, so a large sfDir argument can't blow
      // driver memory on the pairwise queries the way collect() could
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      sb.append(s"===== $name =====\n$plan\n")
      // the adaptive plan prints "== Final Plan ==" AND "== Initial
      // Plan =="; audit only what actually ran
      val lines = plan.split("== Initial Plan ==")(0).linesIterator.toSeq
      def exchanges(ls: Seq[String]) =
        ls.count(l => (l.contains("Exchange hashpartitioning") ||
          l.contains("Exchange rangepartitioning") ||
          l.contains("Exchange SinglePartition")) &&
          !l.contains("ReusedExchange"))
      val executed = exchanges(lines)
      val reused = lines.count(_.contains("ReusedExchange"))
      val joins = lines.flatMap(l => joinRe.findFirstIn(l))
        .filterNot(_ == "Join").mkString("+")
      val pushed = lines.exists(l =>
        l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
      val readCols = lines.filter(_.contains("ReadSchema"))
        .map(l => l.substring(l.indexOf("ReadSchema")).count(_ == ':') - 1)
        .mkString(",")
      summary.append(s"$name | $executed+$reused | $joins | $pushed | $readCols\n")
    }
    Files.write(Paths.get(out), (summary.toString + "\n" + sb.toString).getBytes)
    println(s"[explain] wrote $out")
    println(summary.toString)
    spark.stop()
  }
}
