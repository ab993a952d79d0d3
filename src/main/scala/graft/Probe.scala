package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale probe: builds 10×-scaled variants of the embeddings
  * table under target/probe and times d5_dedup_embedding on each, so
  * the "blocking stays linear in corpus size" claim is measured, not
  * asserted (the d2/d4 analog probed a 20×-duplicated documents corpus
  * in round 1, SURVEY §5).
  *
  *  - `x10distinct`: each copy is per-component perturbed — 10× DISTINCT
  *    vectors, exercising the corpus-scaled bits-per-band growth
  *    (d5BitsPerBand at occupancy target 16: 2000 → 8 bits,
  *    20000 → 11 bits, 200000 → 14 bits);
  *  - `x10dup`: exact copies — 10× rows but the same distinct set,
  *    exercising the group-collapse path (quadratic per bucket if the
  *    collapse ever regresses).
  *
  * Usage: sbt "runMain graft.Probe [sfDir]"; prints one line per case.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, sfDir)
    val n = e.count()
    val copies = spark.range(10).withColumnRenamed("id", "copy")
    val copies100 = spark.range(100).withColumnRenamed("id", "copy")

    // copy k = base vector circularly rotated by k components (negated
    // for k >= 64, so 100 copies stay distinct): norm-preserving and
    // DECORRELATED from the other copies — a shared additive
    // perturbation would point every copy-k vector at the same
    // direction and manufacture bucket skew the base corpus doesn't have
    def distinctScaled(cs: org.apache.spark.sql.DataFrame) = e.crossJoin(cs)
      .select((col("vec_id") + col("copy") * n).as("vec_id"),
        expr("""transform(sequence(0, 63), i ->
          CAST(element_at(embedding, CAST((i + copy) % 64 AS INT) + 1) *
               IF(copy < 64, CAST(1 AS FLOAT), CAST(-1 AS FLOAT))
          AS FLOAT))""").as("embedding"),
        col("label"))
    val dupScaled = e.crossJoin(copies)
      .select((col("vec_id") + col("copy") * n).as("vec_id"),
        col("embedding"), col("label"))

    val base = "target/probe"
    distinctScaled(copies).write.mode("overwrite")
      .parquet(s"$base/x10distinct/embeddings.parquet")
    distinctScaled(copies100).write.mode("overwrite")
      .parquet(s"$base/x100distinct/embeddings.parquet")
    dupScaled.write.mode("overwrite")
      .parquet(s"$base/x10dup/embeddings.parquet")

    def time(name: String, dir: String): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      graft.operators.Dedup.d5Embedding(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = Tables.embeddings(spark, dir).count()
      println(f"""{"probe":"$name","rows":$rows,"sec":$sec%.2f}""")
    }

    time("d5_base_warmup", sfDir) // absorbs codegen/session startup
    time("d5_base", sfDir)
    time("d5_x10_distinct", s"$base/x10distinct")
    time("d5_x100_distinct", s"$base/x100distinct")
    time("d5_x10_dup", s"$base/x10dup")
    spark.stop()
  }
}
