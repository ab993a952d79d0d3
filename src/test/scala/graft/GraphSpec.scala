package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph}

class GraphSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  /** Brute-force ground truth: union-find over the same edges. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] = {
    import s.implicits._
    Graph.connectedComponents(edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components match union-find on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
    assert(ccOf(edges) == unionFind(edges))
  }

  test("a 1000-node chain collapses within the round budget (naive propagation would need 1000)") {
    val edges = (0L until 999L).map(i => (i, i + 1))
    val got = ccOf(edges, maxIter = 12)
    assert(got.size == 1000 && got.values.forall(_ == 0L))
  }

  test("direction and duplicate edges are irrelevant; self loops ignored") {
    val got = ccOf(Seq((5L, 2L), (2L, 5L), (5L, 2L), (9L, 9L), (2L, 7L)))
    // (9,9) is a self loop: node 9 never materializes as a component member
    assert(got == Map(2L -> 2L, 5L -> 2L, 7L -> 2L))
  }

  test("empty edge set yields an empty result") {
    assert(ccOf(Seq.empty).isEmpty)
  }

  test("d8 assigns every document a cluster; clusters agree with union-find over confirmed pairs") {
    import org.apache.spark.sql.functions.col
    val confirmed = Dedup.d4Confirm(s, dir, Dedup.d2Minhash(s, dir))
      .filter(col("jaccard") >= Dedup.KeepMinJaccard)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth = unionFind(confirmed)
    val got = Dedup.d8DedupClusters(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nDocs = graft.Tables.documents(s, dir).count()
    assert(got.size == nDocs, "one row per document")
    got.foreach { case (doc, cl) =>
      assert(cl == truth.getOrElse(doc, doc), s"doc $doc: $cl vs truth")
    }
    // the corpus has actual duplicate clusters to exercise the operator
    assert(got.exists { case (doc, cl) => doc != cl },
      "corpus produced no non-trivial cluster — d8 untested in substance")
  }
}
