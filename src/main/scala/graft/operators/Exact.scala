package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-exact aggregation helpers.
  *
  * Double sums are order-dependent, and Spark's partitioned partial
  * aggregation will not add values in the same order as a single-threaded
  * oracle. All money/measure columns in the test data are 2-decimal
  * values, so we sum in exact decimal arithmetic and convert to double
  * only at the output edge — bit-for-bit reproducible regardless of
  * partitioning, which is exactly what a 1000-executor cluster needs for
  * deterministic results too.
  */
object Exact {
  /** Exact decimal sum of a fixed-point-intended double column, as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact mean: exact decimal sum divided by count, in double. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** DuckDB SQL fragment mirroring [[dsum]]. */
  def sqlDsum(col: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** DuckDB SQL fragment mirroring [[davg]]. */
  def sqlDavg(col: String, scale: Int = 2): String =
    s"${sqlDsum(col, scale)} / count(*)"
}
