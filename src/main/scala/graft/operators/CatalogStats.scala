package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
import org.apache.spark.sql.functions._

/** The missing half of c26/c27: PERSIST the ANALYZE output into the
  * session catalog so the cost-based optimizer actually reads it —
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` re-expressed
  * through the engine's own fused-scan statistics (c26's one-pass
  * scalars, c27's nearest-rank equi-height fences), written via
  * `sessionState.catalog.alterTableStats`.
  *
  * Why this matters next to AQE: adaptive execution can only re-plan
  * AFTER a shuffle stage has materialized and been measured — the
  * first plan still shuffles both sides of a join whose filtered
  * build side the catalog could have proven broadcast-small. Catalog
  * stats flip the STARTING plan: under `spark.sql.cbo.enabled`,
  * FilterEstimation reads rowCount + (ndv, min, max, nullCount) —
  * and, for range predicates on skewed columns, the equi-height
  * histogram — so the broadcast decision (and join ordering) is right
  * before any exchange runs. At 100 TB the difference is shuffling a
  * multi-TB probe side zero times instead of once. CurationSpec
  * asserts both flips plan-visibly: scalar stats turn a sort-merge
  * join into a broadcast join, and on a skewed column the c27
  * histogram corrects a uniform-interpolation overestimate that
  * scalar stats alone get wrong.
  *
  * Scale shape: the stats scan is c26's (one fused aggregate per
  * table, sketch NDV, map-side partials); the histogram adds c27's
  * distinct-value-bounded shuffle. The catalog write is one metastore
  * call per table. Register production tables with
  * `CREATE TABLE ... USING parquet LOCATION` (no copy); [[stage]]
  * copies only because spec corpora are path-based test parquet. */
object CatalogStats {
  /** Register a DataFrame as a catalog parquet table (spec staging —
    * a production lake table registers its existing LOCATION). */
  def stage(s: SparkSession, name: String, df: DataFrame): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    df.write.format("parquet").saveAsTable(name)
  }

  /** Compute and persist catalog statistics for `cols` of table
    * `name`: rowCount + per-column (distinctCount via the q44 HLL
    * sketch, min, max, nullCount, avgLen/maxLen from the type), plus
    * a [[Curation.C27Buckets]]-bin equi-height histogram (c27's
    * nearest-rank fences + per-bin NDV) for `histCols`. One fused
    * scan for the scalars; one distinct-value-bounded pass per
    * histogram column. Returns what was written. */
  def analyze(s: SparkSession, name: String, cols: Seq[String],
      histCols: Set[String] = Set.empty): CatalogStatistics = {
    graft.functions.GraftFunctions.register(s)
    val df = s.table(name)
    // sizeInBytes BEFORE stats exist = the file-based estimate the
    // planner was using; keep it as the honest on-disk size
    val sizeInBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val aggs = cols.flatMap { n => Seq(
      sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"nn_$n"),
      expr(s"hll_sketch(CAST(conv(substring(md5(CAST(`$n` AS STRING))," +
        s" 1, 8), 16, 10) AS BIGINT)).hll_est").as(s"ndv_$n"),
      min(col(n)).cast("double").as(s"mn_$n"),
      max(col(n)).cast("double").as(s"mx_$n")) }
    val row = df.agg(count(lit(1)).as("n"), aggs: _*).collect()(0)
    val nRows = row.getAs[Long]("n")
    val colStats = cols.map { n =>
      val dt = df.schema(n).dataType
      val len = dt.defaultSize.toLong
      def ext(v: Double): String = dt match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => v.toLong.toString
        case _ => v.toString
      }
      val nn = row.getAs[Long](s"nn_$n")
      val (mnO, mxO) =
        if (nn == nRows) (None, None)
        else (Some(ext(row.getAs[Double](s"mn_$n"))),
          Some(ext(row.getAs[Double](s"mx_$n"))))
      n -> CatalogColumnStat(
        distinctCount = Some(BigInt(row.getAs[Long](s"ndv_$n"))),
        min = mnO, max = mxO,
        nullCount = Some(BigInt(nn)),
        avgLen = Some(len), maxLen = Some(len),
        histogram = if (histCols(n)) Some(histogramFor(df, n)) else None)
    }.toMap
    val stats = CatalogStatistics(sizeInBytes, Some(BigInt(nRows)), colStats)
    s.sessionState.catalog.alterTableStats(TableIdentifier(name), Some(stats))
    stats
  }

  /** c27's equi-height fences as the optimizer's [[Histogram]]: bin i
    * spans (ub_{i-1}, ub_i] with ub_i = the smallest value whose
    * cumulative count reaches ceil(i·n/B) (the integer nearest-rank
    * rule — c27Histograms' exact spelling), per-bin NDV counted on
    * the collapsed distinct-value histogram. The window state is
    * distinct-value-bounded (the q33 discipline). */
  private[graft] def histogramFor(df: DataFrame, n: String): Histogram = {
    import org.apache.spark.sql.expressions.Window
    val b = Curation.C27Buckets
    val hist = df.select(col(n).cast("double").as("u"))
      .filter(col("u").isNotNull)
      .groupBy("u").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("u")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum("c").over(w))
      .crossJoin(broadcast(hist.agg(sum("c").as("nv"),
        count(lit(1)).as("ndv_all"), min("u").as("lo0"))))
    val idx = df.sparkSession.range(1, b + 1).toDF("bucket")
    val fences = cum.crossJoin(broadcast(idx))
      .groupBy("bucket")
      .agg(min(when(col("cum") * b >= col("bucket") * col("nv"),
        col("u"))).as("ub"),
        max("nv").as("nv"), max("lo0").as("lo0"))
      .orderBy("bucket").collect()
    val lo0 = fences.head.getAs[Double]("lo0")
    val nv = fences.head.getAs[Long]("nv")
    val ubs = fences.map(_.getAs[Double]("ub"))
    val los = lo0 +: ubs.dropRight(1)
    // per-bin NDV in one histogram-bounded pass: value v belongs to
    // bin i iff los(i) < v <= ubs(i), except bin 0 includes its lo
    val ndvAggs = (0 until b).map { i =>
      sum(when(
        (if (i == 0) col("u") >= los(i) else col("u") > los(i)) &&
          col("u") <= ubs(i), 1L).otherwise(0L)).as(s"ndv_$i")
    }
    val ndvRow = hist.agg(ndvAggs.head, ndvAggs.tail: _*).collect()(0)
    val bins = (0 until b).map { i =>
      HistogramBin(los(i), ubs(i), ndvRow.getAs[Long](s"ndv_$i"))
    }.toArray
    Histogram(nv.toDouble / b, bins)
  }
}
