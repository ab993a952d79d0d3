package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Typed loaders for the test star schema (see TESTDATA.md).
  *
  * All reads go through here so every operator benefits from the same
  * pushdown-friendly scan: `spark.read.parquet` exposes min/max stats,
  * predicate pushdown and column pruning to Catalyst. At cluster scale
  * the same call reads a partitioned table — operators never assume a
  * single file.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame    = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame    = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame      = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame    = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "lineitem"))
  /** `events.ts` is parquet INT64(TIMESTAMP(NANOS)) which Spark cannot map
    * to TimestampType; read nanos as long and convert to a micros timestamp
    * (session TZ is UTC, matching the naive-UTC semantics of the writer). */
  def events(s: SparkSession, dir: String): DataFrame =
    eventsRaw(s, dir).withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** events with `ts` still the raw int64 nanos — predicates built from
    * literals against this column push down to the parquet scan (see
    * Relational.q17TimeRangeFilter). */
  def eventsRaw(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(p(dir, "events"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))
}
