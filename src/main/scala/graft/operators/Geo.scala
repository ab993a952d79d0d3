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

  /** q47 knobs: proximity radius and cell size (integer coordinate
    * units, ~1e-5 degree each), the sister-point jitter bound (2·J² ≤
    * R², so every planted sister lands within radius), the planting
    * modulus, and the row-major cell-key encoder stride (cc stays ≤
    * 720 « the stride, so keys are injective for all index cells). */
  val GeoR = 50000L
  val GeoJ = 35000L
  val GeoSisterMod = 13
  val GeoCellEnc = 100000L

  /** The q47 point set: integer NON-NEGATIVE coordinates derived from
    * c_custkey (no negative operand ever meets div/% — Spark `div`
    * truncates toward zero while other engines may floor, so staying
    * non-negative keeps the arithmetic dialect-proof), plus a planted
    * SISTER point for every [[GeoSisterMod]]-th customer, jittered by
    * strictly-positive offsets < [[GeoJ]] keyed off the ORIGINAL id —
    * guaranteed within-radius pairs at every SF. */
  private def q47Points(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("pid"))
      .withColumn("latu", pmod(col("pid") * 7919L, lit(18000000L)))
      .withColumn("lonu", pmod(col("pid") * 104729L, lit(36000000L)))
    val mx = base.agg(max(col("pid")).as("mxid"))
    val sisters = base.crossJoin(broadcast(mx))
      .filter(col("pid") % GeoSisterMod === 0)
      .select((col("pid") + col("mxid") + 1L).as("pid"),
        (col("latu") + pmod(col("pid") * 31L, lit(GeoJ))).as("latu"),
        (col("lonu") + pmod(col("pid") * 37L, lit(GeoJ))).as("lonu"))
    base.unionByName(sisters)
  }

  /** q47: PROXIMITY self-join — all point pairs within [[GeoR]] index
    * units, the "nearby events / store-catchment overlap / GPS
    * co-location" query. The WRONG plan is the theta-join (all-pairs
    * distance test, quadratic); the production shape is GRID
    * BLOCKING: each point lands in ONE cell (row-local div), the
    * probe side explodes to its 3×3 cell neighborhood, and an
    * EQUI-join on the encoded cell key pairs probe×index — since
    * |Δcoord| ≤ R forces cell indices to differ by ≤ 1, the
    * neighborhood is structurally complete (recall 1.0, spec-pinned
    * against the all-pairs brute force). Each qualifying pair
    * surfaces EXACTLY once: b's index cell matches exactly one of
    * a's nine probe cells, and the pid < pid2 filter kills the
    * mirrored direction — no dedup pass needed. The distance is the
    * exact-integer planar d² (index-unit equirectangular; production
    * swaps haversine at the confirm with the same plan shape). Cost:
    * one scan + one equi-join whose bucket occupancy is density-
    * bounded, never all-pairs — linear at 100 TB for fixed density. */
  def q47GeoPairs(s: SparkSession, dir: String): DataFrame = {
    val p = q47Points(s, dir)
      .withColumn("cr", expr(s"latu div $GeoR"))
      .withColumn("cc", expr(s"lonu div $GeoR"))
    val probe = p
      .withColumn("dr", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dc", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("pid"), col("latu"), col("lonu"),
        ((col("cr") + col("dr")) * GeoCellEnc + col("cc") + col("dc"))
          .as("ck"))
    val index = p.select(col("pid").as("pid2"), col("latu").as("latu2"),
      col("lonu").as("lonu2"),
      (col("cr") * GeoCellEnc + col("cc")).as("ck"))
    probe.join(index, "ck")
      .filter(col("pid") < col("pid2"))
      .withColumn("d2",
        (col("latu") - col("latu2")) * (col("latu") - col("latu2")) +
          (col("lonu") - col("lonu2")) * (col("lonu") - col("lonu2")))
      .filter(col("d2") <= GeoR * GeoR)
      .select(col("pid").as("a"), col("pid2").as("b"), col("d2"))
      .orderBy("a", "b")
  }

  val oracle: Map[String, String] = Map(
    "q47_geo_pairs" ->
      s"""WITH base AS (
         |  SELECT CAST(c_custkey AS BIGINT) AS pid,
         |    (c_custkey * 7919) % 18000000 AS latu,
         |    (c_custkey * 104729) % 36000000 AS lonu
         |  FROM customer),
         |mx AS (SELECT max(pid) AS mxid FROM base),
         |pts AS (
         |  SELECT pid, latu, lonu FROM base
         |  UNION ALL
  -- base.pid qualified: the jitter is keyed off the ORIGINAL id, and
  -- an unqualified pid could bind to the lateral alias in some engines
         |  SELECT base.pid + mxid + 1 AS pid,
         |    latu + (base.pid * 31) % $GeoJ AS latu,
         |    lonu + (base.pid * 37) % $GeoJ AS lonu
         |  FROM base CROSS JOIN mx WHERE base.pid % $GeoSisterMod = 0),
         |cells AS (
         |  SELECT pid, latu, lonu,
         |    latu // $GeoR AS cr, lonu // $GeoR AS cc FROM pts),
         |probe AS (
         |  SELECT pid, latu, lonu,
         |    (cr + dr) * $GeoCellEnc + cc + dc AS ck
         |  FROM cells
         |  CROSS JOIN (VALUES (-1), (0), (1)) drs(dr)
         |  CROSS JOIN (VALUES (-1), (0), (1)) dcs(dc)),
         |idx AS (
         |  SELECT pid AS pid2, latu AS latu2, lonu AS lonu2,
         |    cr * $GeoCellEnc + cc AS ck FROM cells)
         |SELECT p.pid AS a, i.pid2 AS b,
         |  (p.latu - i.latu2) * (p.latu - i.latu2)
         |    + (p.lonu - i.lonu2) * (p.lonu - i.lonu2) AS d2
         |FROM probe p JOIN idx i ON i.ck = p.ck AND p.pid < i.pid2
         |WHERE (p.latu - i.latu2) * (p.latu - i.latu2)
         |    + (p.lonu - i.lonu2) * (p.lonu - i.lonu2)
         |  <= ${GeoR * GeoR}
         |ORDER BY a, b""".stripMargin,
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
    "q47_geo_pairs" -> q47GeoPairs,
  )
}
