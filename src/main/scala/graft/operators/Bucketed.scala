package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Sources

/** Shuffle-free fact-fact joins via bucketed tables — the pay-once
  * alternative to per-query shuffles that SURVEY §5 prescribes for
  * repeated large joins (the reference's taxi ETL re-joins the same
  * tables every run; at 100 TB the join shuffle dominates, and
  * bucketing moves that cost to write time).
  *
  * q23 writes orders and lineitem bucketed AND bucket-sorted by their
  * join key into the session warehouse (once per session — re-runs
  * reuse the tables), then joins them: both scans report the same hash
  * partitioning, so the sort-merge join needs NO Exchange and NO Sort —
  * the only shuffle left in the query is the small post-join
  * aggregation. BucketedSpec asserts the exchange-free join subtree;
  * the DuckDB oracle runs the same join on the RAW tables, proving the
  * bucketed copies change nothing semantically.
  */
object Bucketed {
  val Buckets = 16

  private def tag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Bucketed-table names for `dir` (session warehouse). */
  def tableNames(dir: String): (String, String) =
    (s"graft_orders_bkt_${tag(dir)}", s"graft_lineitem_bkt_${tag(dir)}")

  /** Ensure the bucketed copies exist (pay-once; skipped when the
    * session catalog already has them). A location left behind by a
    * previous session (in-memory catalog forgets, warehouse dir
    * persists) is removed first — CTAS refuses to create a table over
    * an existing location. */
  def ensureTables(s: SparkSession, dir: String): (String, String) = {
    val (ot, lt) = tableNames(dir)
    def write(table: String, df: => org.apache.spark.sql.DataFrame,
              key: String): Unit =
      if (!s.catalog.tableExists(table)) {
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
        loc.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(loc, /* recursive = */ true)
        Sources.writeBucketed(df, table, key, Buckets)
      }
    write(ot, Tables.orders(s, dir).select("o_orderkey", "o_orderstatus"),
      "o_orderkey")
    write(lt, Tables.lineitem(s, dir).select("l_orderkey", "l_returnflag",
      "l_quantity"), "l_orderkey")
    (ot, lt)
  }

  /** q23: orders ⋈ lineitem on the bucket key with no join-side
    * Exchange. The merge hint pins the sort-merge strategy (a broadcast
    * join would be legal at small SF and also shuffle-free, but the
    * point of the entry is the bucketed path that still works when
    * neither side fits in memory at 100 TB). */
  def q23BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = ensureTables(s, dir)
    val o = s.table(ot).hint("merge")
    val l = s.table(lt)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus", "l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        Exact.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderstatus", "l_returnflag")
  }

  val oracle: Map[String, String] = Map(
    "q23_bucketed_join" ->
      s"""SELECT o_orderstatus, l_returnflag,
         |  CAST(count(*) AS BIGINT) AS n_items,
         |  ${Exact.sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus, l_returnflag
         |ORDER BY o_orderstatus, l_returnflag""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_bucketed_join" -> q23BucketedJoin,
  )
}
