package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Pipeline, Task}
import graft.sources.Sources

/** End-to-end integration of the reference's marquee Airflow DAG
  * (airflow/dags/twitter_airflow.py): raw tweet JSONL with a nested
  * user record and array columns → flatten → dedup-append into the
  * "db" table (csv_to_sqlite's read-once append) → popular-links
  * report (identify_popular_links: last-day filter, explode urls,
  * global frequency count, top-k) — all through graft's Sources +
  * Pipeline + the same query shapes the gate checks, proving the
  * pieces compose, not just pass in isolation. */
class TwitterPipelineSpec extends AnyFunSuite {

  private val tweetSchema = StructType(Seq(
    StructField("tweet_id", LongType),
    StructField("created", TimestampType),
    StructField("favorite_count", LongType),
    StructField("user", StructType(Seq(
      StructField("screen_name", StringType),
      StructField("followers", LongType)))),
    StructField("urls", ArrayType(StringType))))

  private def stageJsonl(dir: String): String = {
    // two dumps with one overlapping tweet (id 2): the append must not
    // double-count it — the reference renames files to *_read to get
    // the same read-once property
    val day = "2024-03-0"
    def t(id: Long, d: Int, fav: Long, user: String, urls: Seq[String]) =
      s"""{"tweet_id":$id,"created":"$day${d}T12:00:00Z","favorite_count":$fav,""" +
        s""""user":{"screen_name":"$user","followers":${fav * 10}},""" +
        s""""urls":[${urls.map("\"" + _ + "\"").mkString(",")}]}"""
    Files.writeString(java.nio.file.Paths.get(dir, "dump1.jsonl"),
      Seq(
        t(1, 1, 5, "ada", Seq("a.io", "b.io")),
        t(2, 2, 9, "grace", Seq("a.io")),
        t(3, 2, 2, "ada", Seq("c.io"))).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(dir, "dump2.jsonl"),
      Seq(
        t(2, 2, 9, "grace", Seq("a.io")), // duplicate of dump1's id 2
        t(4, 2, 7, "linus", Seq("a.io", "c.io")),
        t(5, 2, 1, "ada", Seq("b.io"))).mkString("\n"))
    dir
  }

  test("tweet JSONL → flatten → dedup-append → popular-links report, as a DAG") {
    val s = TestSpark.spark
    val root = Files.createTempDirectory("graft_twitter").toString
    stageJsonl(root)
    val db = s"$root/tweets_db"

    val ingest = new Task {
      val name = "ingest_tweets"
      val output = s"$root/tweets_flat"
      def build(sp: SparkSession): DataFrame =
        Sources.flattenStruct(
          Sources.jsonl(sp, s"$root/dump*.jsonl", tweetSchema), "user")
    }
    val report = new Task {
      val name = "popular_links"
      override val requires = Seq(ingest)
      val output = s"$root/latest_links"
      def build(sp: SparkSession): DataFrame = {
        // csv_to_sqlite: append each flattened batch exactly once
        Sources.appendOnce(sp, ingest.read(sp), db, "tweet_id")
        val tweets = sp.read.parquet(db)
        // identify_popular_links: last-day window (strictly after the
        // cutoff, like the reference's `created > date('now','-1 days')`),
        // explode urls, top-k
        val maxTs = tweets.agg(max("created")).head.getTimestamp(0)
        tweets
          .filter(col("created") > lit(new java.sql.Timestamp(
            maxTs.getTime - 24L * 3600 * 1000)))
          .select(explode(col("urls")).as("url"))
          .groupBy("url").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("url"))
          .limit(5)
      }
    }

    // the distribution leaf: render the report into the "email body"
    // (the reference's gen_tweet_report → EmailOperator,
    // twitter_airflow.py:137-170) through the same atomic-commit path
    val email = new graft.pipeline.TextReportTask {
      val name = "email_report"
      override val requires = Seq(report)
      val output = s"$root/email_report"
      def render(sp: SparkSession): String = {
        val rows = report.read(sp)
          .orderBy(col("cnt").desc, col("url")).collect()
        "Subject: popular links\n\n" + rows.zipWithIndex.map { case (r, i) =>
          s"${i + 1}. ${r.getString(0)} (${r.getLong(1)})"
        }.mkString("\n") + "\n"
      }
    }

    assert(Pipeline.run(s, Seq(email)) ===
      Seq("ingest_tweets", "popular_links", "email_report"))

    // the overlapping tweet appended once: 5 distinct tweets in the db
    assert(s.read.parquet(db).count() === 5)
    // day-2 tweets only (ids 2..5); url counts: a.io 2, b.io 1, c.io 2
    val links = report.read(s).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(links.toSeq === Seq("a.io" -> 2L, "c.io" -> 2L, "b.io" -> 1L))
    // the rendered body carries the same ranking
    val body = graft.pipeline.TextReportTask.readBody(s, email.output)
    assert(body ==
      "Subject: popular links\n\n1. a.io (2)\n2. c.io (2)\n3. b.io (1)\n")

    // re-running the DAG is a no-op (targets complete, db unchanged)
    assert(Pipeline.run(s, Seq(email)) === Seq.empty)
    assert(s.read.parquet(db).count() === 5)
  }
}
