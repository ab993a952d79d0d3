package graft

import org.apache.spark.sql.functions._

/** Dev-only stage probe for q46_fuzzy_join: times each pipeline slice
  * through the noop sink so the expensive stage is measured, not
  * guessed. Usage: sbt "Test/runMain graft.Q46Probe [sfDir]". */
object Q46Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get()
    s.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(tag: String)(body: => Unit): Unit = {
      val xs = (1 to 3).map { _ =>
        s.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q46probe] $tag%-28s ${xs.sorted.apply(1)}%6.3f s (3-rep median)")
    }

    val clean = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    val maxId = clean.agg(max("c_custkey")).head().getLong(0)
    val dirty = clean
      .filter(col("c_custkey") % operators.Linkage.DirtyMod === 0)
      .select((col("c_custkey") + maxId + 1).as("d_id"),
        when(col("c_custkey") % operators.Linkage.ExactMod === 0, col("c_name"))
          .otherwise(expr(
            "concat(substr(c_name, 1, 9 + CAST(c_custkey % 9 AS INT)), " +
              "substr(c_name, 11 + CAST(c_custkey % 9 AS INT), 1000000))"))
          .as("d_name"))
    val cleanNames = clean.groupBy("c_name").agg(min("c_custkey").as("c_custkey"))
    val dirtyNames = dirty.groupBy("d_name")
      .agg(sort_array(collect_list(col("d_id"))).as("members"))
    def delKeys(n: String): String =
      s"array_distinct(concat(array($n), transform(sequence(1, length($n)), " +
        s"p -> concat(substr($n, 1, p - 1), substr($n, p + 1, 1000000)))))"
    val cleanKeys = cleanNames
      .select(col("c_custkey"), col("c_name"), explode(expr(delKeys("c_name"))).as("ks"))
      .select(col("c_custkey"), col("c_name"), xxhash64(col("ks")).as("k"))
    val dirtyKeys = dirtyNames
      .select(col("d_name"), explode(expr(delKeys("d_name"))).as("ks"))
      .select(col("d_name"), xxhash64(col("ks")).as("k"))

    timed("names (group+collect)") { noop(cleanNames); noop(dirtyNames) }
    timed("cleanKeys explode+hash") { noop(cleanKeys) }
    timed("dirtyKeys explode+hash") { noop(dirtyKeys) }
    timed("candidate join+distinct") {
      noop(dirtyKeys.join(cleanKeys, "k")
        .select("d_name", "c_custkey", "c_name").distinct())
    }
    timed("…+lev+window (best)") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("d_name").orderBy(col("dist"), col("c_custkey"))
      noop(dirtyKeys.join(cleanKeys, "k")
        .select("d_name", "c_custkey", "c_name").distinct()
        .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
        .filter(col("dist") <= operators.Linkage.FuzzyMaxDist)
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1))
    }
    timed("FULL q46") {
      noop(operators.Linkage.q46FuzzyJoin(s, dir))
    }
    s.stop()
  }
}
