package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** c30's composition contract: the one-query flag-frame DAG must equal
  * the stage-by-stage composition — each stage applied INDEPENDENTLY
  * to the previous stage's survivor set, spelled from the standalone
  * entries (t14/t13/t12/t15/c2/d9/d15/c5) plus driver-side reference
  * arithmetic for the two survivor-dependent thresholds. Lives in
  * graft.operators so it can reach the package-private stage
  * spellings. */
class CurationV2Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  /** Stage-by-stage survivor chain, each stage an independent
    * spelling. Returns per-stage survivor id sets (after stages
    * 1, 3, 4, 5, 6, 7) plus the normalize changed-count among stage-1
    * survivors. */
  private def referenceChain(): (Seq[Set[Long]], Long) = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    // stage 1 — URL dedup: the t14 gate entry's variant-1 canon, keep
    // min doc_id per canonical key
    val canon = TextAnalysis.t14UrlCanonicalize(s, dir)
      .filter(col("variant") === 1).select("doc_id", "canon")
    val s1 = canon.groupBy("canon").agg(min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    // stage 2 — normalize: EXACTLY the t13 gate entry's norm/changed
    val t13 = TextAnalysis.t13Normalize(s, dir)
      .select("doc_id", "norm", "changed").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val nChanged = t13.count { case (id, (_, chg)) => s1(id) && chg == 1 }
    // stage 3 — gopher battery over the t13 norm
    val normDf = t13.toSeq.map { case (id, (n, _)) => (id, n) }
      .toDF("doc_id", "ptext")
    val pass = TextAnalysis.gopherCols(normDf)
      .filter(col("passes_gopher")).select("doc_id").as[Long]
      .collect().toSet
    val s3 = s1 & pass
    // stage 4 — classifier score over the t13 norm via the JOIN
    // spelling (the HOF walk's pinned fallback), then the per-source
    // nearest-rank top-quarter computed DRIVER-SIDE from the sorted
    // survivor scores
    val m = Classifier.modelFor(s, dir)
    val wdf = s.createDataFrame(m.train.map(t => (t._1, t._4)))
      .toDF("f", "w_micro")
    val scores = normDf
      .withColumn("norm", TextOps.normText(col("ptext")))
      .withColumn("toks", expr(TextOps.toksExpr))
      .select(col("doc_id"), explode_outer(col("toks")).as("tok"))
      .withColumn("f",
        TextAnalysis.bucketMod(col("tok"), Classifier.ClfBuckets))
      .join(broadcast(wdf), Seq("f"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("w_micro"), lit(0L))).as("tok_sum"))
      .select(col("doc_id"),
        (lit(m.priorMicro) + coalesce(col("tok_sum"), lit(0L)))
          .as("score_micro"))
      .as[(Long, Long)].collect().toMap
    val srcOf = Tables.documents(s, dir).select("doc_id", "source", "lang")
      .as[(Long, String, String)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val bySrc = s3.toSeq.groupBy(id => srcOf(id)._1)
    val s4 = bySrc.flatMap { case (_, ids) =>
      val sorted = ids.map(scores).sortBy(-_)
      val k = (ids.size + Curation.C22KeepDen - 1) / Curation.C22KeepDen
      val thr = sorted(k - 1) // k-th largest; ties at thr all kept
      ids.filter(id => scores(id) >= thr)
    }.toSet
    // stage 5 — cluster policy: the c2 gate entry's kept representatives
    val kept = Curation.c2ClusterCuration(s, dir)
      .select("doc_id").as[Long].collect().toSet
    val s5 = s4 & kept
    // stage 6 — decontamination: bench holdout + d9 n-gram + d15
    // semantic (standalone entries)
    val d9 = Dedup.d9Decontaminate(s, dir)
      .select("doc_id").as[Long].collect().toSet
    val d15 = Similarity.d15SemDecontam(s, dir)
      .filter(col("contaminated") === 1)
      .select("vec_id").as[Long].collect().toSet
    val s6 = s5.filter(id => TestSpark.sampleBucket(id) >= Dedup.D9BenchPct
      && !d9(id) && !d15(id))
    // stage 7 — c5 temperature mix over the SURVIVORS' language counts
    val byLang = s6.groupBy(id => srcOf(id)._2).map { case (l, ids) =>
      l -> ids.size
    }
    val nMax = byLang.values.max
    val kb = byLang.map { case (l, n) =>
      l -> math.floor(math.min(1.0,
        Curation.C5BaseFrac * math.sqrt(nMax.toDouble / n))
        * Curation.C5Buckets).toInt
    }
    val s7 = s6.filter(id =>
      TestSpark.bucketMod(id, Curation.C5Buckets) < kb(srcOf(id)._2))
    (Seq(s1, s3, s4, s5, s6, s7), nChanged.toLong)
  }

  test("c30 one-query DAG equals the stage-by-stage composition of " +
    "the standalone entries; the report counts the same chain; every " +
    "filter stage removes rows and normalize changes rows") {
    import s.implicits._
    val (stages, nChanged) = referenceChain()
    val got = Curation.c30CurationV2(s, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(got == stages.last,
      s"composed DAG diverged: only-in-DAG=${(got -- stages.last).toSeq.sorted.take(5)}, " +
        s"only-in-chain=${(stages.last -- got).toSeq.sorted.take(5)}")
    val rep = Curation.c30Report(s, dir).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val n = Tables.documents(s, dir).count()
    val outs = Seq("url_dedup" -> stages(0), "gopher_rules" -> stages(1),
      "quality_cut" -> stages(2), "cluster_dedup" -> stages(3),
      "decontaminate" -> stages(4), "lang_mix" -> stages(5))
    assert(rep("url_dedup")._1 == n)
    outs.foreach { case (stage, ids) =>
      assert(rep(stage)._2 == ids.size.toLong,
        s"$stage rows_out ${rep(stage)._2} != chain ${ids.size}")
      assert(rep(stage)._3 > 0, s"$stage dropped nothing")
    }
    assert(rep("normalize")._1 == rep("normalize")._2 &&
      rep("normalize")._3 == 0, "normalize is a transform stage")
    assert(rep("normalize")._4 == nChanged && nChanged > 0,
      "normalize rows_changed must equal the t13 changed count over " +
        "stage-1 survivors")
  }
}
