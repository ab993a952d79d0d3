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
  * The output is stamped with the git commit it was generated at, and
  * generation REFUSES a dirty product-source tree (src/main, build.sbt)
  * unless SPARK_GRAFT_EXPLAIN_ALLOW_DIRTY=1 — round 9 shipped a
  * PLANS.txt whose t8 section audited a plan that no longer existed
  * because the plan swap and the regeneration landed in the wrong
  * order; with the stamp, staleness is mechanically checkable
  * (tools/check_plans.sh: stale iff product source changed between the
  * stamped commit and HEAD).
  *
  * Usage: sbt "runMain graft.Explain [sfDir] [outFile]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.txt"

    import scala.sys.process._
    def git(cmd: String*): String =
      try Process("git" +: cmd).!!.trim catch { case _: Exception => "" }
    val sha = git("rev-parse", "HEAD")
    val dirty =
      git("status", "--porcelain", "--", "src/main", "build.sbt").nonEmpty
    if (dirty && !sys.env.get("SPARK_GRAFT_EXPLAIN_ALLOW_DIRTY").contains("1")) {
      System.err.println("[explain] REFUSING to generate: src/main or " +
        "build.sbt has uncommitted changes, so the stamped commit would " +
        "not identify the audited code. Commit first (or set " +
        "SPARK_GRAFT_EXPLAIN_ALLOW_DIRTY=1 for a throwaway audit).")
      sys.exit(1)
    }

    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")

    val sb = new StringBuilder
    val summary = new StringBuilder
    summary.append(s"# generated-at-commit: $sha" +
      (if (dirty) " (DIRTY TREE — not authoritative)" else "") + "\n")
    summary.append("# stale iff: ! git diff --quiet <commit>..HEAD -- " +
      "src/main build.sbt   (tools/check_plans.sh)\n")
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
