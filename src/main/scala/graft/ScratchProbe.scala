package graft

/** throwaway (deleted before commit): c28 steady-state decomposition */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val s = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm everything once
    t("full c28 (warm staging)")(SparkEntry.queries("c28_admit_shard")(s, dir).write.format("noop").mode("overwrite").save())
    t("full c28 run 2")(SparkEntry.queries("c28_admit_shard")(s, dir).write.format("noop").mode("overwrite").save())
    val shardPath = operators.Curation.c28ShardPath(s, dir)
    val shard = t("shard read+checkpoint")(s.read.parquet(shardPath).localCheckpoint(true))
    val sig = t("d11Admit build+run")({
      val d = operators.Dedup.d11Admit(s, dir, shard.select("doc_id", "text"))
      d.write.format("noop").mode("overwrite").save(); d })
    t("d12Admit build+run")({
      val d = operators.Similarity.d12Admit(s, dir, shard.select(col("doc_id").as("vec_id"), col("embedding")))
      d.write.format("noop").mode("overwrite").save() })
    s.stop()
  }
}
