package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Geo enrichment: lat/lon → zone lookup, the reverse-geocode step of
  * the reference's taxi ETL (luigi/taxi_data_import.py:79+ enriches
  * trips with a borough via a geolookup service).
  *
  * Scale shape: the WRONG plan at 100 TB is a range/polygon containment
  * join (Spark plans it as a broadcast nested loop — every point tests
  * every zone). The production pattern is cell indexing: map each point
  * to a grid cell with pure row-local arithmetic, and equi-join the
  * cell id against a broadcast cell→zone dimension — a
  * BroadcastHashJoin, one scan, zero shuffles before the aggregate.
  * Polygon zones generalize by covering each polygon with cells
  * (multiple dim rows per zone); the join stays the same.
  *
  * The test schema has no coordinates, so q24 derives deterministic
  * synthetic lat/lon from c_custkey (mirrored exactly in the DuckDB
  * oracle) — the enrichment join itself is the real thing.
  */
object Geo {
  /** 5×5 world grid: cell id = row-major index over 36°×72° cells. */
  val GridRows = 5
  val GridCols = 5

  /** Synthetic deterministic coordinates for a customer key. */
  private def withCoords(df: DataFrame): DataFrame = df
    .withColumn("lat",
      (pmod(col("c_custkey") * 7919, lit(18000)) / 100.0) - 90.0)
    .withColumn("lon",
      (pmod(col("c_custkey") * 104729, lit(36000)) / 100.0) - 180.0)

  /** Grid-cell id for (lat, lon) — row-local arithmetic, no join. */
  private def cellCol = (
    floor((col("lat") + 90.0) / (180.0 / GridRows)) * GridCols +
      floor((col("lon") + 180.0) / (360.0 / GridCols))
    ).cast("int")

  /** The zone dimension: one row per grid cell, named after the nation
    * with the matching key (a stand-in for the reference's borough
    * table; 25 cells = 25 nations). */
  def zones(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .select(col("n_nationkey").cast("int").as("cell"),
        col("n_name").as("zone_name"))

  /** q24: enrich customers with their zone, then count + average
    * account balance per zone — the taxi "trips per borough" report
    * shape. */
  def q24GeoEnrich(s: SparkSession, dir: String): DataFrame =
    withCoords(Tables.customer(s, dir).select("c_custkey", "c_acctbal"))
      .withColumn("cell", cellCol)
      .join(broadcast(zones(s, dir)), Seq("cell"))
      .groupBy("zone_name")
      .agg(count(lit(1)).as("n_customers"),
        Exact.davg(col("c_acctbal")).as("avg_bal"))
      .orderBy("zone_name")

  val oracle: Map[String, String] = Map(
    "q24_geo_enrich" ->
      s"""WITH pts AS (
         |  SELECT c_custkey, c_acctbal,
         |    ((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS lat,
         |    ((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS lon
         |  FROM customer),
         |cells AS (
         |  SELECT c_acctbal,
         |    CAST(floor((lat + 90.0) / ${180.0 / GridRows}) * $GridCols +
         |         floor((lon + 180.0) / ${360.0 / GridCols}) AS INT) AS cell
         |  FROM pts),
         |z AS (SELECT CAST(n_nationkey AS INT) AS cell, n_name AS zone_name
         |      FROM nation)
         |SELECT zone_name, CAST(count(*) AS BIGINT) AS n_customers,
         |  ${Exact.sqlDavg("c_acctbal")} AS avg_bal
         |FROM cells JOIN z USING (cell)
         |GROUP BY zone_name ORDER BY zone_name""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_geo_enrich" -> q24GeoEnrich,
  )
}
