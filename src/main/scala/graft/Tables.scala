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

  /** Metadata-only fingerprint of one table: path + per-file
    * (name, length, mtime). One FS listing, no data read — the cache key
    * for per-corpus memoization (Similarity centroids, Dedup confirmed
    * pairs): a re-ingested corpus at the same path changes file
    * lengths/mtimes and misses the cache, so a long-lived JVM can never
    * serve results computed on a previous corpus generation. */
  def fingerprint(s: SparkSession, dir: String, table: String): String = {
    val path = new org.apache.hadoop.fs.Path(p(dir, table))
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(path)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir\n$entries".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
}
