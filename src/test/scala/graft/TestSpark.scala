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
}
