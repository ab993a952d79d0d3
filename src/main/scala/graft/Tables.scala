package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

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
  /** events with `ts` normalized to TimestampType (micros, session TZ =
    * UTC), whichever on-disk generation is present. The current
    * test-corpus writer emits parquet TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark scans as TIMESTAMP_NTZ — the
    * naive value IS the UTC instant, so a cast to TimestampType under
    * the UTC session is a pure reinterpretation, not a clock shift. An
    * earlier generation wrote INT64(TIMESTAMP(NANOS)), which Spark
    * cannot map to a timestamp at all; that shape (or a plain
    * int64-nanos column) is read as raw long and truncated to micros.
    * Type-dispatch on the scanned schema keeps every generation
    * readable — at cluster scale a long-lived table inevitably spans
    * writer generations, and the reader, not the writer, absorbs that. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = eventsRaw(s, dir)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case _ => df // already TIMESTAMP (LTZ)
    }
  }

  /** events with `ts` exactly as stored — TIMESTAMP_NTZ for the current
    * corpus generation, raw int64 nanos for the legacy one. Used where
    * predicates must be spelled against the scan-native column so they
    * push down to the parquet reader (Relational.q17TimeRangeFilter,
    * ScaleBench's pass-through corpus copy). Callers dispatch on
    * `schema("ts").dataType`. */
  def eventsRaw(s: SparkSession, dir: String): DataFrame = {
    // no-op for TIMESTAMP(MICROS) files; lets legacy NANOS files load as long
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(p(dir, "events"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))

  /** `documents`, guaranteed at least CLUSTER-CORE scan parallelism
    * for a COMPUTE-HEAVY first pass (normalize/tokenize/shingle/
    * fingerprint kernels: orders of magnitude more work per row than
    * the scan bytes suggest). A compact corpus — one small parquet
    * file, or one ROW GROUP, which the reader cannot split however
    * low maxPartitionBytes goes — yields a single scan task, and the
    * whole kernel pass serializes onto one core (found by the r16 d4
    * band adjudication: the serialized stage is both slow and
    * hypersensitive to machine load). ADAPTIVE, not unconditional: a
    * production-scale corpus already has ≫ cores splits, and a
    * round-robin exchange there would shuffle the full text corpus
    * for nothing. The comparison point is `defaultParallelism`
    * (total executor cores — the quantity the spread exists to keep
    * busy), deliberately NOT `spark.sql.shuffle.partitions`: a
    * cluster session sizes the latter at 2–3× cores PLUS the
    * largest-shuffle floor (GraftSession.clusterBuilder — thousands),
    * and comparing against it would re-shuffle a corpus whose scan
    * already saturates every core (r16 review finding #1); the
    * repartition target is cores too — one task wave, not thousands
    * of slivers of a compact corpus. The partition probe (physical
    * planning, no job, one FS listing) is memoized per corpus
    * fingerprint — several operators consult it more than once per
    * query (the embCountCache pattern). */
  def documentsSpread(s: SparkSession, dir: String): DataFrame = {
    val df = documents(s, dir)
    val cores = s.sparkContext.defaultParallelism
    // keyed by (SESSION identity, fingerprint), not fingerprint alone:
    // the probed split count depends on session config (parallelism,
    // maxPartitionBytes), so a sibling SparkSession in the same JVM
    // must re-probe rather than inherit another session's decision —
    // and applicationId is SHARED by every session of one SparkContext
    // (r17 review), so the key uses the session object's identity
    val parts = scanPartsCache.computeIfAbsent(
      System.identityHashCode(s).toString + "/" +
        fingerprint(s, dir, "documents"),
      _ => Integer.valueOf(df.rdd.getNumPartitions)).intValue
    if (parts < cores) df.repartition(cores) else df
  }

  private val scanPartsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Drop every memoized scan-partition probe (the hook the other
    * per-corpus memos expose — ScaleBench/MemProbe-style harnesses that
    * rewrite a corpus in place under one session can re-probe). */
  private[graft] def clearScanPartsCache(): Unit = scanPartsCache.clear()

  /** Metadata-only fingerprint of one table: path + per-file
    * (name, length, mtime). One FS listing, no data read — the cache key
    * for per-corpus memoization (Similarity centroids, Dedup confirmed
    * pairs): a re-ingested corpus at the same path changes file
    * lengths/mtimes and misses the cache, so a long-lived JVM can never
    * serve results computed on a previous corpus generation. */
  /** Metadata-only on-disk size of one table (sum of file lengths, one
    * FS listing, no data read, no Spark job) — the cheap scale probe
    * size-adaptive operators gate on (the quantile family's serial-
    * window escape): row counts would need a footer read or a job,
    * but every size gate here only needs order-of-magnitude. */
  def tableBytes(s: SparkSession, dir: String, table: String): Long = {
    val path = new org.apache.hadoop.fs.Path(p(dir, table))
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(path).map(_.getLen).sum
  }

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
