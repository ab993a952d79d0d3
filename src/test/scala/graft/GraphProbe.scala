package graft

import org.apache.spark.sql.functions._

/** Dev-only decomposition of the graph family's edge builds: the
  * orders⋈lineitem trade frame feeds BOTH direction branches of the
  * edges union — is the union's duplicated final aggregate (above the
  * reused exchange) worth an explode-based single-pass spelling? */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get()
    s.sparkContext.setLogLevel("WARN")
    def med(name: String)(body: => Unit): Unit = {
      body
      val xs = (1 to 3).map { _ =>
        s.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[gprobe] $name%-14s ${xs(1)}%.3f  (${xs.map(x => f"$x%.2f").mkString(" ")})")
    }
    def release(df: org.apache.spark.sql.DataFrame): Unit =
      org.apache.spark.sql.graftbridge.GraftCheckpoints.releaseLocalCheckpoint(df)
    def trade = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("a"),
        (col("l_suppkey").cast("long") * 2 + 1).as("b"))
      .distinct()
    med("trade")(trade.write.format("noop").mode("overwrite").save())
    med("edges_union") {
      val e = trade.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(trade.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(true)
      release(e)
    }
    med("edges_explode") {
      val e = trade.select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .localCheckpoint(true)
      release(e)
    }
    med("q36_full") {
      operators.Graph.q36Pagerank(s, dir)
        .write.format("noop").mode("overwrite").save()
    }
    med("q55_full") {
      operators.Graph.q55CheapestPath(s, dir)
        .write.format("noop").mode("overwrite").save()
    }
    med("q49_full") {
      operators.Graph.q49BfsHops(s, dir)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
