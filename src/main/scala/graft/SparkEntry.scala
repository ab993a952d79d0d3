package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, Bucketed, Dedup, Geo, Multimodal, Relational, Similarity, Skew, TextAnalysis}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q10StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ Streams.queries ++
      AsOf.queries ++ Bucketed.queries ++ Geo.queries ++ Skew.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for s3_ann_ivf (iterative
    * k-means centroids are not SQL-expressible) → rows-only check with
    * recall measured against s1 in SimilaritySpec. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Dedup.oracle ++ Similarity.oracle ++
      TextAnalysis.oracle ++ Streams.oracle ++ AsOf.oracle ++
      Multimodal.oracle ++ Bucketed.oracle ++ Geo.oracle ++ Skew.oracle
}
