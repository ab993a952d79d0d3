package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Geo

class GeoSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("q47 grid-blocked proximity join equals the all-pairs brute " +
      "force; every planted sister pair is within radius") {
    import org.apache.spark.sql.functions._
    val got = Geo.q47GeoPairs(s, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("d2")))
    // driver-side brute force over the same derived point set
    val base = Tables.customer(s, dir)
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
      .map(k => (k, (k * 7919L) % 18000000L, (k * 104729L) % 36000000L))
    val mx = base.map(_._1).max
    val sisters = base.filter(_._1 % Geo.GeoSisterMod == 0)
      .map { case (k, la, lo) =>
        (k + mx + 1, la + (k * 31L) % Geo.GeoJ, lo + (k * 37L) % Geo.GeoJ)
      }
    val pts = base ++ sisters
    val brute = (for {
      (pa, la, lo) <- pts
      (pb, lb, lob) <- pts
      if pa < pb
      d2 = (la - lb) * (la - lb) + (lo - lob) * (lo - lob)
      if d2 <= Geo.GeoR * Geo.GeoR
    } yield (pa, pb, d2)).toSet
    assert(got.toSet == brute,
      "grid blocking must equal the all-pairs brute force")
    // structural recall: every sister pair lands within radius by the
    // jitter bound 2*J^2 <= R^2, so each must be in the output
    val byPair = got.map(t => (t._1, t._2)).toSet
    base.filter(_._1 % Geo.GeoSisterMod == 0).foreach { case (k, _, _) =>
      assert(byPair((k, k + mx + 1)), s"sister pair of $k missing")
    }
    assert(got.nonEmpty)
  }

  test("q47 plans the pair join as a hash equi-join on the cell key, " +
      "never an all-pairs product") {
    val plan = Geo.q47GeoPairs(s, dir).queryExecution.executedPlan.toString
    // the point-pair join must be the hash join keyed on ck
    assert(plan.contains("BroadcastHashJoin [ck"),
      s"expected a hash join on the cell key:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"proximity join fell back to an all-pairs product:\n$plan")
    // nested-loop joins may only appear as 1-row scalar attaches (the
    // max-id broadcast for sister derivation), never between the
    // point-pair sides
    val bnlj = plan.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"unexpected nested-loop joins ($bnlj):\n$plan")
  }
}
