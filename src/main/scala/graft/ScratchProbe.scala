package graft

/** throwaway (deleted before commit): 100x probes for the embedding
  * self-join family (d5, d10) — hunting the s12 broadcast trap */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val out = "target/sf100sim-emb"
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (q <- Seq("d5_dedup_embedding", "d10_semdedup", "d12_semdedup_incremental")) {
      try {
        t(s"$q sf0.1")(SparkEntry.queries(q)(s, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save())
        t(s"$q 100x run1")(SparkEntry.queries(q)(s, out).write.format("noop").mode("overwrite").save())
        t(s"$q 100x run2")(SparkEntry.queries(q)(s, out).write.format("noop").mode("overwrite").save())
      } catch { case e: Throwable => println(s"[scratch] $q FAILED: ${e.getMessage.take(200)}") }
    }
    s.stop()
  }
}
