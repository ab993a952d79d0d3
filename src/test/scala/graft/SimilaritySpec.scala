package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("s1 returns top-3 per query, self excluded, ranked by cosine") {
    val rows = Similarity.s1BruteForce(s, dir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until Similarity.NumQueries).toSet)
    byQuery.foreach { case (q, rs) =>
      assert(rs.length == Similarity.TopK)
      assert(rs.forall(_.getLong(2) != q), "self match leaked")
      val cs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.sameElements(cs.sortBy(-_)), "rank order != cosine order")
    }
  }

  test("s2 LSH results are a subset of same-bucket candidates with cosines matching s1 scale") {
    val rows = Similarity.s2Lsh(s, dir).collect()
    // approximate: fewer or equal results, never more than top-k per query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= Similarity.TopK)
    }
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }

  test("s2 recall vs s1 is nonzero on this corpus") {
    val exact = Similarity.s1BruteForce(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.s2Lsh(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(approx.nonEmpty)
    // every approx hit is a real vector pair; recall is reported not asserted
    info(s"s2 recall vs s1: ${(exact & approx).size}/${exact.size}")
  }

  test("s3 IVF returns ranked neighbors and overlaps s1 ground truth") {
    val ivf = Similarity.s3Ivf(s, dir).collect()
    assert(ivf.nonEmpty)
    // structure: per query at most TopK ranked rows
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= Similarity.TopK)
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
    // recall vs exact: IVF with a single probe finds a meaningful share
    // of the true neighbors that live in the query's own cell
    val truth = Similarity.s1BruteForce(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val found = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (found & truth).size.toDouble / truth.size
    info(f"IVF recall@${Similarity.TopK} = $recall%.2f")
    assert(recall >= 0.5)
  }
}
