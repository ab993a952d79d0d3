package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * s1 is the exact baseline: broadcast the (small) query set against the
  * corpus — at 100 TB the corpus side streams through executors once and
  * the only state per task is the broadcast queries.
  *
  * s2 is the scale path: deterministic random-hyperplane LSH buckets the
  * corpus (one map pass), then scoring happens only inside the query's
  * bucket — sublinear scan at the cost of recall.
  */
object Similarity {
  val NumQueries = 5
  val TopK = 3
  val HyperPlanes = 6

  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  /** s1: brute-force cosine top-k per query vector. */
  def s1BruteForce(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cand = Tables.embeddings(s, dir)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.crossJoin(broadcast(queriesDf(s, dir)))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorOps.cosine("qe", "ce"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select("query_id", "rnk", "neighbor_id", "cos")
      .orderBy("query_id", "rnk")
  }

  /** Deterministic ±1 hyperplane weight for (plane j, component i∈1..64):
    * sign pattern from cheap integer arithmetic, identical in SQL. */
  private def projExpr(v: String, j: Int): String =
    s"""aggregate(transform(sequence(1, 64),
       |    i -> CAST(element_at($v, i) AS DOUBLE) *
       |         IF((((i - 1) * 31 + $j * 17) % 7) < 3,
       |            CAST(1 AS DOUBLE), CAST(-1 AS DOUBLE))),
       |  CAST(0 AS DOUBLE), (a, b) -> a + b)""".stripMargin

  private def sqlProj(v: String, j: Int): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
       |    i -> CAST($v[i] AS DOUBLE) *
       |         (CASE WHEN (((i - 1) * 31 + $j * 17) % 7) < 3
       |          THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)),
       |  (x, y) -> x + y)""".stripMargin

  /** Native fused kernel (graft.functions.HyperplaneBucket); the HOF
    * spelling below ([[bucketColHof]]) is interpreted per element and
    * would dominate at a full-corpus embedding table. */
  private def bucketCol(v: String) = expr(s"hyperplane_bucket($v, $HyperPlanes)")

  /** HOF formulation of [[bucketCol]] — kept as executable documentation
    * of the fold order the native kernel reproduces (FunctionsSpec pins
    * the bit-equality). */
  def bucketColHof(v: String): org.apache.spark.sql.Column = expr(
    (0 until HyperPlanes)
      .map(j => s"IF((${projExpr(v, j)}) > 0, ${1 << j}, 0)")
      .mkString("(", " + ", ")"))

  private def sqlBucket(v: String): String =
    (0 until HyperPlanes)
      .map(j => s"(CASE WHEN (${sqlProj(v, j)}) > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** s2: LSH-bucketed ANN — score only within the query's sign bucket. */
  def s2Lsh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val bucketed = Tables.embeddings(s, dir)
      .withColumn("bucket", bucketCol("embedding"))
    val q = bucketed.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("bucket").as("qb"))
    val cand = bucketed
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(broadcast(q),
        col("bucket") === col("qb") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorOps.cosine("qe", "ce"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select("query_id", "rnk", "neighbor_id", "cos")
      .orderBy("query_id", "rnk")
  }

  /** Number of IVF cells (coarse-quantizer centroids). */
  val IvfCells = 16

  /** s3: IVF ANN — the other standard production scale path next to LSH.
    *
    * Coarse quantizer: [[IvfCells]] deterministic centroids (the lowest
    * vec_ids; production would k-means a sample offline and persist).
    * Every vector is assigned to its max-cosine centroid by a fixed-size
    * argmax — 16 native cosine_sim calls + array_max over (cos, id)
    * structs, all codegen'd, no per-row lambda — and a query scans only
    * its own cell. The centroid set is collected once at plan build
    * (16×64 floats) and inlined as literals, so the assignment runs
    * scan-local with zero extra shuffle; corpus-side work is one keyed
    * shuffle on the cell id. Rows-only (spec measures recall vs s1). */
  def s3Ivf(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val centroids: Array[(Int, Array[Float])] = Tables.embeddings(s, dir)
      .filter(col("vec_id") < IvfCells)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
    require(centroids.length == IvfCells, s"corpus smaller than $IvfCells")

    def litVec(v: Array[Float]) =
      s"array(${v.map(x => s"CAST($x AS FLOAT)").mkString(",")})"
    val cellExpr = expr(
      "array_max(array(" + centroids.map { case (id, v) =>
        s"struct(cosine_sim(embedding, ${litVec(v)}) AS cos, $id AS id)"
      }.mkString(",") + ")).id")

    val assigned = Tables.embeddings(s, dir)
      .withColumn("cell", cellExpr)
    val q = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cell").as("qc"))
    val cand = assigned
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        col("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(broadcast(q),
        col("cell") === col("qc") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorOps.cosine("qe", "ce"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select("query_id", "rnk", "neighbor_id", "cos")
      .orderBy("query_id", "rnk")
  }

  // ---------------------------------------------------------------- oracle

  val oracle: Map[String, String] = Map(
    "s1_ann_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |  FROM embeddings WHERE vec_id < $NumQueries),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${VectorOps.sqlCosine("qe", "ce")} AS cos
         |  FROM q, c WHERE query_id <> neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, cos
         |FROM ranked WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin,
    "s2_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding,
         |    ${sqlBucket("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket AS qb
         |  FROM b WHERE vec_id < $NumQueries),
         |scored AS (
         |  SELECT query_id, vec_id AS neighbor_id,
         |    ${VectorOps.sqlCosine("qe", "embedding")} AS cos
         |  FROM q JOIN b ON b.bucket = q.qb AND b.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, cos
         |FROM ranked WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_ann_bruteforce" -> s1BruteForce,
    "s2_ann_lsh" -> s2Lsh,
    "s3_ann_ivf" -> s3Ivf, // rows-only: recall measured in SimilaritySpec
  )
}
