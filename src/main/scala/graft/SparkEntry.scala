package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, Bpe, Bucketed, Classifier, Curation, Dedup, Geo, Graph, Multimodal, Partitioned, Linkage, Relational, Similarity, Skew, TextAnalysis, Zorder}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The FULL curation DAG (quality floor → cluster-aware
    * dedup via d8's transitive cluster ids with boilerplate-cluster
    * caps and canonical-representative picks → d9 decontamination →
    * per-source cap, c4) is the engine's flagship: one corpus pass
    * exercising the kernel registry, the LSH banding, the row-local
    * confirm join, the star-contraction membership, the broadcast
    * 8-gram inventory and the WindowGroupLimit cap, mirroring the
    * reference's composed-DAG flagship
    * (airflow/dags/twitter_airflow.py:69-137) at curation altitude. */
  def entry(spark: SparkSession): DataFrame =
    Curation.c4CurationFull(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ Streams.queries ++
      AsOf.queries ++ Bucketed.queries ++ Geo.queries ++ Skew.queries ++
      Curation.queries ++ Partitioned.queries ++ Bpe.queries ++
      Graph.queries ++ Zorder.queries ++ Linkage.queries ++
      Classifier.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. s3_ann_ivf's SQL is GENERATED at dump
    * time with its deterministic per-corpus k-means centroids inlined
    * as literals (training is not SQL-expressible; assignment, probing
    * and top-k are — Similarity.s3OracleSql). This static form requires
    * the quantizer to have already trained (it fails loudly otherwise —
    * a premature dump must not silently shrink the gate); Verify uses
    * [[oracleSqlFor]], which trains on demand for its explicit corpus. */
  def oracleSql: Map[String, String] =
    staticOracles ++ Similarity.oracle ++ Bpe.oracle

  /** Corpus-aware dump: identical to [[oracleSql]] except s3's entry is
    * derived for the GIVEN corpus dir (cache-hit if its query already
    * ran), with no dependence on run order or global state. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    staticOracles ++ Similarity.oracleFor(spark, sfDir) ++
      Bpe.oracleFor(spark, sfDir)

  private def staticOracles: Map[String, String] =
    Relational.oracle ++ Dedup.oracle ++
      TextAnalysis.oracle ++ Streams.oracle ++ AsOf.oracle ++
      Multimodal.oracle ++ Bucketed.oracle ++ Geo.oracle ++ Skew.oracle ++
      Curation.oracle ++ Partitioned.oracle ++ Graph.oracle ++ Zorder.oracle ++
      Linkage.oracle ++ Classifier.oracle
}
