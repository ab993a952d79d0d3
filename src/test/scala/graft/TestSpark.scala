package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test / fork := true). */
object TestSpark {
  val SfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Driver-side mirror of TextAnalysis.sampleBucket (first 16 md5
    * bits of the id string, mod 100) for brute-force spec references —
    * one shared spelling so specs cannot drift from each other. */
  def sampleBucket(id: Long): Int = bucketMod(id, 100)

  /** Parameterized form (TextAnalysis.bucketMod): m=10000 is c5's
    * acceptance-threshold granularity. */
  def bucketMod(id: Long, m: Int): Int =
    Integer.parseInt(org.apache.commons.codec.digest.DigestUtils
      .md5Hex(id.toString).substring(0, 4), 16) % m

  /** Flatten an executed plan, descending through AQE query-stage
    * wrappers (whose subtrees are not `children`) — the one shared
    * spelling for every spec's plan assertions. */
  def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flattenPlan)
  }
}
