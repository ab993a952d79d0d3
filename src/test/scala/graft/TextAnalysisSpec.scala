package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("t1 scores and prediction are consistent") {
    val rows = TextAnalysis.t1LangId(s, dir).collect()
    rows.foreach { r =>
      val scores = Map("en" -> r.getInt(1), "de" -> r.getInt(2),
        "es" -> r.getInt(3), "fr" -> r.getInt(4))
      val predicted = r.getString(5)
      assert(scores(predicted) == scores.values.max,
        s"doc ${r.getLong(0)}: predicted $predicted not argmax of $scores")
    }
  }

  test("t2 ratios are within [0,1] and score is their blend") {
    val rows = TextAnalysis.t2QualityScore(s, dir).collect()
    rows.foreach { r =>
      val (stopRatio, score) = (r.getDouble(3), r.getDouble(4))
      assert(stopRatio >= 0.0 && stopRatio <= 1.0)
      assert(score >= 0.0 && score <= 1.0)
    }
  }

  test("t3 whitespace and regex token counts agree on this corpus") {
    // corpus is strictly lowercase words + single spaces
    val rows = TextAnalysis.t3TokenCount(s, dir).collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"doc ${r.getLong(0)}: ws=${r.getInt(1)} re=${r.getInt(2)}")
      assert(r.getInt(3) >= r.getInt(2), "bpe pieces < word tokens")
    }
  }

  test("t4 rolling fingerprint is stable and bounded") {
    val a = TextAnalysis.t4Fingerprint(s, dir).collect()
    val b = TextAnalysis.t4Fingerprint(s, dir).collect()
    assert(a.map(_.getLong(2)).sameElements(b.map(_.getLong(2))))
    assert(a.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 1000000007L))
    assert(a.forall(_.getString(1).length == 32))
  }

  test("t5 sample is deterministic, nested, and roughly uniform per stratum") {
    import org.apache.spark.sql.functions._
    val a = TextAnalysis.t5StratifiedSample(s, dir).collect()
    val b = TextAnalysis.t5StratifiedSample(s, dir).collect()
    assert(a.map(_.getLong(0)).sameElements(b.map(_.getLong(0))), "not deterministic")
    // nesting: an INDEPENDENTLY computed 10% sample is a strict subset
    // of the 20% one (growing a training set never discards work)
    val ten = TextAnalysis.t5StratifiedSample(s, dir, pct = 10).collect()
      .map(_.getLong(0)).toSet
    val twenty = a.map(_.getLong(0)).toSet
    assert(ten.nonEmpty && ten.size < twenty.size && ten.subsetOf(twenty))
    // rough rate check: ~20% overall (md5 uniformity; wide tolerance)
    val total = Tables.documents(s, dir).count()
    val rate = a.length.toDouble / total
    assert(rate > 0.10 && rate < 0.30, f"sample rate $rate%.2f far from 0.20")
    // stratification: every lang present in the corpus appears in the
    // sample (uniform within stratum, corpus has >=100 docs per lang)
    val langs = Tables.documents(s, dir).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(a.map(_.getString(1)).toSet == langs)
  }

  test("c1 curation output satisfies all three stage predicates, no more, no less") {
    import graft.operators.{Curation, Dedup}
    val out = Curation.c1CurationPipeline(s, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val scores = TextAnalysis.t2QualityScore(s, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val kept = Dedup.d6DedupPipeline(s, dir).collect().map(_.getLong(0)).toSet
    val sampled = TextAnalysis.t5StratifiedSample(s, dir).collect()
      .map(_.getLong(0)).toSet
    val expected = scores.keySet
      .filter(id => scores(id) >= Curation.QualityMin)
      .intersect(kept).intersect(sampled)
    assert(out.keySet == expected)
    assert(out.forall { case (id, sc) => sc == scores(id) })
    assert(out.nonEmpty)
  }

  test("property: rolling hash matches a reference fold on generated ascii strings") {
    import org.apache.spark.sql.functions._
    val params = org.scalacheck.Gen.Parameters.default
    val gen = org.scalacheck.Gen.nonEmptyListOf(
      org.scalacheck.Gen.alphaLowerChar).map(_.mkString)
    val samples = (0 until 50).flatMap(i =>
      gen(params, org.scalacheck.rng.Seed(42L + i)))
    assert(samples.size >= 40)
    val sess = s
    import sess.implicits._
    val got = samples.toDF("norm").select(col("norm"), expr(
      """aggregate(filter(split(norm, ''), c -> c <> ''),
        |  CAST(0 AS BIGINT),
        |  (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)""".stripMargin).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { text =>
      val expected =
        text.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
      assert(got(text) == expected, s"mismatch for '$text'")
    }
  }
}
