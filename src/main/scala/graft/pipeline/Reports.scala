package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Concrete report renderers — the analytic artifacts the reference
  * DISTRIBUTES (airflow/dags/twitter_airflow.py:137-170: the
  * `gen_tweet_report` PythonOperator renders "what was popular" into an
  * email body and an EmailOperator ships it). graft's equivalent
  * renders its own audit artifacts — the c4 retention lineage
  * ([[graft.operators.Curation.c4Report]]) and the q9 popular-links
  * top-5 — into one deterministic body published through the
  * [[TextReportTask]] atomic-commit path.
  *
  * Scale note: both inputs are REPORT-sized by construction (5 lineage
  * rows, top-5 links — each the output of an already-audited
  * aggregation), so the driver-side collect here is formatting, not
  * computation; at 100 TB the heavy lifting stays in the upstream
  * plans. */
object Reports {
  /** The curation "email body": c4 per-stage retention + q9 top links.
    * Deterministic — no timestamps or hostnames; same corpus bytes ⇒
    * same body bytes (see [[TextReportTask.render]]'s contract). */
  def curationReportBody(s: SparkSession, dir: String): String = {
    val sb = new StringBuilder
    sb.append("Subject: corpus curation report\n\n")
    sb.append("Retention by stage (c4 curation DAG):\n")
    sb.append(f"${"stage"}%-14s ${"rows_in"}%8s ${"rows_out"}%9s ${"dropped"}%8s\n")
    graft.operators.Curation.c4Report(s, dir).collect().foreach { r =>
      sb.append(f"${r.getString(1)}%-14s ${r.getLong(2)}%8d " +
        f"${r.getLong(3)}%9d ${r.getLong(4)}%8d\n")
    }
    sb.append("\nTop links (q9 popular words, en):\n")
    graft.operators.Relational.q9PopularLinks(s, dir).collect()
      .zipWithIndex.foreach { case (r, i) =>
        sb.append(s"${i + 1}. ${r.getString(0)} (${r.getLong(1)})\n")
      }
    sb.toString
  }

  /** The distribution task: render → atomic publish under
    * `outBase/curation_report/report.txt`. Idempotent like every
    * pipeline target (complete ⇒ re-run no-ops). */
  def curationReportTask(dir: String, outBase: String,
      upstream: Seq[Task] = Seq.empty): TextReportTask =
    new TextReportTask {
      val name = "curation_report"
      override val requires: Seq[Task] = upstream
      val output = s"$outBase/curation_report"
      def render(spark: SparkSession): String = curationReportBody(spark, dir)
    }
}
