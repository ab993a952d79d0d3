package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage

class LinkageSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q46 matches every dirty record to its planted source with the " +
      "planted distance; equals a brute-force best-match") {
    val clean = Tables.customer(s, dir).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val maxId = clean.map(_._1).max
    val got = Linkage.q46FuzzyJoin(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .toSeq
    // planted: every eligible source appears with its planted distance
    val sources = clean.filter(_._1 % Linkage.DirtyMod == 0)
    assert(got.map(_._1).toSeq == sources.map(_._1 + maxId + 1),
      "one best match per dirty record, in id order")
    got.foreach { case (dId, mKey, _, dist) =>
      val src = dId - maxId - 1
      assert(dist == (if (src % Linkage.ExactMod == 0) 0 else 1),
        s"planted distance for $dId")
      // exact copies are unambiguous; a digit deletion can tie with a
      // SMALLER key at the same distance (delete the leading '1' of
      // 105 → one insert reaches both 105 and 5) — the metric, not a
      // provenance bug, and the (dist, key) tie rule settles it
      if (src % Linkage.ExactMod == 0)
        assert(mKey == src, s"exact dirty $dId must match its source")
    }
    val toSource = got.count { case (dId, mKey, _, _) =>
      mKey == dId - maxId - 1 }
    assert(toSource >= got.length * 95 / 100,
      s"ambiguous ties must be rare: $toSource/${got.length} to source")
    // brute force: the deletion join must equal exhaustive best-match
    // (the SymSpell recall theorem, checked empirically at this SF)
    val dirtyNames = sources.map { case (k, name) =>
      val p = (9 + k % 9).toInt
      (k + maxId + 1,
        if (k % Linkage.ExactMod == 0) name
        else name.substring(0, p) + name.substring(p + 1))
    }
    val brute = dirtyNames.map { case (dId, dn) =>
      val best = clean
        .map { case (ck, cn) => (lev(dn, cn), ck, cn) }
        .filter(_._1 <= Linkage.FuzzyMaxDist)
        .minBy(t => (t._1, t._2))
      (dId, best._2, best._3, best._1)
    }
    assert(got == brute, "deletion join == exhaustive best match")
  }

  test("deletion-neighborhood intersection is complete for distance <= 1 " +
      "on adversarial string shapes") {
    def delKeys(x: String): Set[String] =
      Set(x) ++ x.indices.map(i => x.substring(0, i) + x.substring(i + 1))
    val cases = Seq(
      ("kitten", "mitten"), ("kitten", "kiten"), ("kitten", "kittens"),
      ("aaaa", "aaa"), ("abab", "abab"), ("", "x"), ("x", ""),
      ("ab", "ba"), ("abc", "abd"), ("0001", "001"))
    cases.foreach { case (a, b) =>
      val d = lev(a, b)
      if (d <= 1)
        assert((delKeys(a) & delKeys(b)).nonEmpty,
          s"recall hole: '$a' vs '$b' at distance $d")
    }
    // and the known distance-2 admit ('ab'→'ba') is caught by verify
    assert(lev("ab", "ba") == 2 && (delKeys("ab") & delKeys("ba")).nonEmpty,
      "precision relies on the levenshtein verify, as documented")
  }

  test("q53 verdicts equal a driver unique-match replay; merges are " +
      "never wrong; ambiguity means >1 master genuinely in range; " +
      "no entity ever exceeds one master plus its variants") {
    val clean = Tables.customer(s, dir).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val maxId = clean.map(_._1).max
    val got = Linkage.q53ErClusters(s, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // driver replay of the unique-match merge-or-queue rule
    val dirty = clean.filter(_._1 % Linkage.DirtyMod == 0).map {
      case (k, n) =>
        val nm = if (k % Linkage.ExactMod == 0) n
        else n.substring(0, 9 + (k % 9).toInt) +
          n.substring(10 + (k % 9).toInt)
        (k + maxId + 1) -> nm
    }
    val recs = clean ++ dirty
    val byName = recs.groupBy(_._2)
    val nid = byName.view.mapValues(_.map(_._1).min).toMap
    val isClean = byName.view.mapValues(_.exists(_._1 <= maxId)).toMap
    val masterNames = byName.keys.filter(isClean).toSeq
    def matchesOf(n: String): Seq[String] =
      masterNames.filter(m => lev(n, m) <= Linkage.FuzzyMaxDist)
    val expected = recs.map { case (id, n) =>
      if (id <= maxId) id -> ((nid(n), "master"))
      else if (isClean(n)) id -> ((nid(n), "merged"))
      else {
        val ms = matchesOf(n)
        if (ms.length == 1) id -> ((nid(ms.head), "merged"))
        else if (ms.length > 1) id -> ((nid(n), "ambiguous"))
        else id -> ((nid(n), "new"))
      }
    }.toMap
    assert(got == expected)
    // a merge is never wrong: every merged incoming record's entity
    // is within the threshold of its own name
    val nameOf = recs.toMap
    got.foreach { case (id, (e, st)) =>
      if (st == "merged" && id > maxId) {
        val master = nameOf(e)
        assert(lev(nameOf(id), master) <= Linkage.FuzzyMaxDist,
          s"record $id merged to a master out of range")
      }
    }
    // ambiguity is genuine: each queued record really has >1 master
    val nAmb = got.count(_._2._2 == "ambiguous")
    val nMerged = got.count { case (id, (_, st)) =>
      st == "merged" && id > maxId }
    assert(nAmb > 0 && nMerged > 0, "both verdicts must be exercised")
    info(s"incoming: ${dirty.size}, merged: $nMerged, ambiguous: $nAmb")
    // no percolation: an entity is one master + its merged variants,
    // never a chain (the giant-component failure the unique-match
    // rule exists to prevent — the transitive spelling measured one
    // 15,000-record entity at sf0.1)
    val sizes = got.toSeq.groupBy(_._2._1).map(_._2.size)
    assert(sizes.max <= 1 + dirty.size / 10,
      s"suspiciously large entity: ${sizes.max}")
  }
}
