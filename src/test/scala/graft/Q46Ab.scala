package graft

import org.apache.spark.sql.functions._

/** Dev-only same-JVM A/B of the q46 verify spellings: pushed-lev (the
  * lazy distinct, filter pushed into the join) vs cut (distinct
  * localCheckpointed before the verify). Alternates A/B/A/B so box
  * weather hits both sides equally. */
object Q46Ab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get()
    s.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("d_name").orderBy(col("dist"), col("c_custkey"))

    def finish(best: org.apache.spark.sql.DataFrame) = best
      .join(dirtyNames, "d_name")
      .select(explode(col("members")).as("d_id"),
        col("c_custkey").as("matched_key"),
        col("c_name").as("matched_name"), col("dist").cast("int").as("dist"))
      .orderBy("d_id")

    def pushed(): Unit = noop(finish(
      dirtyKeys.join(cleanKeys, "k")
        .select("d_name", "c_custkey", "c_name").distinct()
        .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
        .filter(col("dist") <= operators.Linkage.FuzzyMaxDist)
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
        .drop("rnk")))
    def cut(): Unit = {
      val cand = dirtyKeys.join(cleanKeys, "k")
        .select("d_name", "c_custkey", "c_name").distinct()
        .localCheckpoint(true)
      noop(finish(
        cand.withColumn("dist", levenshtein(col("d_name"), col("c_name")))
          .filter(col("dist") <= operators.Linkage.FuzzyMaxDist)
          .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
          .drop("rnk")))
      org.apache.spark.sql.graftbridge.GraftCheckpoints.releaseLocalCheckpoint(cand)
    }

    pushed(); cut() // warmup both codegen paths
    val (pa, ca) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to 4) {
      s.catalog.clearCache(); System.gc()
      var t0 = System.nanoTime(); pushed(); pa += (System.nanoTime() - t0) / 1e9
      s.catalog.clearCache(); System.gc()
      t0 = System.nanoTime(); cut(); ca += (System.nanoTime() - t0) / 1e9
    }
    def fmt(xs: Array[Double]) = xs.map(x => f"$x%.3f").mkString(" ")
    println(s"[q46ab] pushed: ${fmt(pa.result())}")
    println(s"[q46ab] cut:    ${fmt(ca.result())}")
    s.stop()
  }
}
