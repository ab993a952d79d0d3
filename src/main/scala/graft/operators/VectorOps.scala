package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Vector math over `array<float>` columns using higher-order functions —
  * no UDFs, evaluated row-local with zero shuffle.
  *
  * The fold order (left-to-right, double accumulator seeded with the
  * first product) is mirrored exactly by the DuckDB `list_reduce` oracle
  * fragments, so cosine values are bit-identical across engines — no
  * output rounding needed.
  */
object VectorOps {
  /** Left-fold dot product of two array<float> columns, in double. */
  def dot(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b,
       |    (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  /** Cosine similarity of two array<float> columns — the native fused
    * expression (graft.functions.CosineSim); call sites must have run
    * `GraftFunctions.register(spark)` first. Bit-identical to
    * [[cosineHof]] and to [[sqlCosine]]. */
  def cosine(a: String, b: String): Column = expr(s"cosine_sim($a, $b)")

  /** Higher-order-function formulation of cosine (kept as the
    * registration-free fallback and as executable documentation of the
    * fold order the native expression reproduces). */
  def cosineHof(a: String, b: String): Column = expr(
    s"""${dotSql(a, b, spark = true)} /
       |  (sqrt(${dotSql(a, a, spark = true)}) *
       |   sqrt(${dotSql(b, b, spark = true)}))""".stripMargin)

  private def dotSql(a: String, b: String, spark: Boolean): String =
    if (spark)
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    else
      s"list_reduce(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** DuckDB fragment mirroring [[dot]] (64-dim embeddings). */
  def sqlDot(a: String, b: String): String = dotSql(a, b, spark = false)

  /** DuckDB fragment mirroring [[cosine]]. */
  def sqlCosine(a: String, b: String): String =
    s"${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"
}
