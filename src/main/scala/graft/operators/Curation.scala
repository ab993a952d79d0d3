package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end corpus curation — the composed pass a training-data
  * pipeline runs before tokenization: quality-score filter (t2) →
  * near-duplicate removal (the d2→d4Confirm→keep chain) → deterministic
  * nested sampling (t5). Mirrors the reference's composed-DAG shape
  * (airflow/dags/twitter_airflow.py:69-137) at the corpus-curation
  * altitude.
  *
  * Scale shape: every stage is linear or candidate-bounded — the
  * quality score is a scan-local projection, the dedup chain is the
  * blocked screen/confirm/keep composition (never all-pairs), and the
  * sample filter is row-local hash arithmetic. The documents table is
  * scanned once per stage; at 100 TB the dedup chain dominates and the
  * extra quality/sample scans are bandwidth-bound map work that AQE
  * schedules alongside it.
  *
  * Semantics note: the d2 screen only considers docs with ≥
  * [[Dedup.MinToks]] tokens, so near-duplicates among very short docs
  * ride through the keep-list (the oracle mirrors this exactly). A
  * production corpus pass runs exact dedup (d1) upstream, which
  * collapses short exact copies; the quality threshold additionally
  * drops most sub-[[QualityMin]] fragments here.
  */
object Curation {

  /** Minimum t2 quality score kept (scores on the synthetic corpus run
    * 0.05–0.57, median ≈ 0.30 — the threshold keeps roughly the better
    * half). Shared with the DuckDB oracle. */
  val QualityMin = 0.3

  /** c1: curated corpus — doc_id, lang, score for every document that
    * (a) scores ≥ [[QualityMin]], (b) survives the dedup keep-list, and
    * (c) falls in the deterministic [[TextAnalysis.SamplePct]]% sample
    * bucket. */
  def c1CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.t2QualityScore(s, dir).select("doc_id", "score")
    val keep = Dedup.d6DedupPipeline(s, dir)
    Tables.documents(s, dir).select("doc_id", "lang")
      .join(quality, "doc_id")
      .filter(col("score") >= QualityMin)
      .join(keep, Seq("doc_id"), "left_semi")
      .filter(TextAnalysis.sampleBucket(col("doc_id")) < TextAnalysis.SamplePct)
      .select("doc_id", "lang", "score")
      .orderBy("doc_id")
  }

  val oracle: Map[String, String] = Map(
    "c1_curation_pipeline" ->
      s"""${Dedup.sqlConfirmedCtes},
         |m AS (SELECT doc_id, lang,
         |    CAST(len(toks) AS INTEGER) AS n_tok,
         |    CAST(len(list_filter(toks,
         |      t -> t IN (${TextAnalysis.sqlStopList}))) AS BIGINT) AS n_stop
         |  FROM tok_t),
         |q AS (SELECT doc_id, lang,
         |    ${TextAnalysis.sqlScore("n_stop", "n_tok")} AS score
         |  FROM m)
         |SELECT doc_id, lang, score FROM q
         |WHERE score >= $QualityMin
         |  AND doc_id NOT IN (
         |    SELECT doc_b FROM confirmed
         |    WHERE jaccard >= ${Dedup.KeepMinJaccard})
         |  AND ${TextAnalysis.sqlSampleBucket("doc_id")}
         |      < ${TextAnalysis.SamplePct}
         |ORDER BY doc_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_curation_pipeline" -> c1CurationPipeline,
  )
}
