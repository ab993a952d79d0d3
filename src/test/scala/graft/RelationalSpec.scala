package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("every relational query runs and returns rows") {
    Relational.queries.foreach { case (name, fn) =>
      assert(fn(s, dir).count() > 0, s"$name returned no rows")
    }
  }

  test("q1 groups by (returnflag, linestatus) with sane aggregates") {
    val rows = Relational.q1MultiAgg(s, dir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (mn, mx, avg, med) = (r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7))
      assert(mn <= med && med <= mx && mn <= avg && avg <= mx)
    }
  }

  test("q4 is sorted descending by acctbal, k=10") {
    val bals = Relational.q4SortTopk(s, dir).collect().map(_.getDouble(2))
    assert(bals.length == 10)
    assert(bals.sameElements(bals.sortBy(-_)))
  }

  test("q13 word counts sum to the corpus token total") {
    import org.apache.spark.sql.functions._
    val total = Tables.documents(s, dir)
      .select(size(expr("filter(split(text, ' '), t -> t <> '')")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val counted = Relational.q13Wordcount(s, dir)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(counted == total)
  }

  test("q17 keeps only the trailing day") {
    import org.apache.spark.sql.functions._
    val e = Tables.events(s, dir)
    val maxTs = e.agg(max("ts")).collect()(0).getTimestamp(0)
    val cnt = Relational.q17TimeRangeFilter(s, dir)
      .agg(sum("cnt")).collect()(0).getLong(0)
    val expected = e.filter(
      col("ts") > lit(maxTs) - expr("INTERVAL 1 DAY")).count()
    assert(cnt == expected)
  }

  test("q19 pivot row sums equal hourly event counts") {
    import org.apache.spark.sql.functions._
    val p = Relational.q19PivotAgg(s, dir)
      .withColumn("total",
        col("click") + col("error") + col("purchase") + col("signup") + col("view"))
    val byHour = Tables.events(s, dir)
      .groupBy(hour(col("ts")).as("hr")).count()
    val joined = p.join(byHour, "hr")
      .filter(col("total") =!= col("count")).count()
    assert(joined == 0)
  }

  test("q29 KMV sketch matches a driver-side build; exact below capacity; " +
      "estimate within KMV error above it") {
    import graft.operators.Relational
    // driver-side ground truth: distinct (type, first-32-bits-of-md5)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(uid: Long): Long = {
      val hex = md.digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val pairs = Tables.events(s, dir).select("event_type", "user_id")
      .collect().map(r => r.getString(0) -> h32(r.getLong(1))).distinct
    val byType = pairs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    def check(k: Int): Unit = {
      val got = Relational.q29KmvDistinct(s, dir, k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.map(_._1).toSeq == byType.keys.toSeq.sorted)
      got.foreach { case (tpe, nHashes, est) =>
        val hs = byType(tpe)
        assert(nHashes == hs.length, s"$tpe n_hashes")
        if (hs.length < k) assert(est == hs.length, s"$tpe under-capacity")
        else {
          val kth = hs(k - 1)
          assert(est == (k - 1).toLong * 4294967296L / kth,
            s"$tpe estimate formula")
          // KMV relative error ~ 1/sqrt(k-2); allow 4 sigma
          val err = math.abs(est.toDouble - hs.length) / hs.length
          assert(err < 4.0 / math.sqrt(k - 2.0), s"$tpe err $err at k=$k")
        }
      }
    }
    check(8)                  // sketch path (15 users per type at sf0.001)
    check(Relational.KmvK)    // under-capacity path: exact counts
    assert(byType.values.exists(_.length < Relational.KmvK),
      "capacity fallback not exercised")
    assert(byType.values.exists(_.length >= 8), "sketch path not exercised")
  }

  test("q31 sketch-merge overlap matches driver-side truth below capacity " +
      "and the merge formula above it") {
    import graft.operators.Relational
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(uid: Long): Long = {
      val hex = md.digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val pairs = Tables.events(s, dir).select("event_type", "user_id")
      .collect().map(r => r.getString(0) -> h32(r.getLong(1))).distinct
    val byType = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def check(k: Int): Unit = {
      val got = Relational.q31KmvOverlap(s, dir, k).collect()
      val typeList = byType.keys.toSeq.sorted
      val wantPairs =
        for (a <- typeList; b <- typeList if a < b) yield (a, b)
      assert(got.map(r => (r.getString(0), r.getString(1))).toSeq
        == wantPairs, s"pair coverage at k=$k")
      got.foreach { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        val (nK, nBoth) = (r.getInt(2), r.getInt(3))
        val (estU, estI) = (r.getLong(4), r.getLong(5))
        // reproduce the merge driver-side from the PER-TYPE sketches
        val skA = byType(a).toSeq.sorted.take(k).toSet
        val skB = byType(b).toSeq.sorted.take(k).toSet
        val unionK = (skA ++ skB).toSeq.sorted.take(k)
        assert(nK == unionK.length, s"$a/$b n_k")
        assert(nBoth == unionK.count(h => skA(h) && skB(h)), s"$a/$b n_both")
        val wantU =
          if (unionK.length == k) (k - 1).toLong * 4294967296L / unionK.last
          else unionK.length.toLong
        assert(estU == wantU, s"$a/$b est_union")
        assert(estI == nBoth.toLong * estU / nK, s"$a/$b est_inter")
        assert(r.getInt(6) == (nBoth.toLong * 1000 / nK).toInt)
        // exact branch: union under capacity reports truth exactly
        val trueU = (byType(a) ++ byType(b)).size
        val trueI = (byType(a) & byType(b)).size
        if (trueU < k) {
          assert(estU == trueU, s"$a/$b exact union")
          assert(estI == trueI, s"$a/$b exact intersection")
        }
      }
    }
    check(Relational.KmvK)
    check(8) // force the estimate branch on this corpus
  }

  test("q40 HLL registers match a driver-side numberOfLeadingZeros build; " +
      "the ~all row is the register-wise-max merge; planted disjoint " +
      "corpus exercises both estimate branches") {
    import graft.operators.Relational
    val wb = Relational.HllWBits
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(uid: Long): Long = {
      val hex = md.digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    // independent rho spelling: bin-length == 64 - numberOfLeadingZeros
    def replay(users: Iterable[Long]): (Int, Long, Long) = {
      val regs = scala.collection.mutable.Map[Long, Int]()
      users.foreach { u =>
        val h = h32(u)
        val idx = h >> wb
        val w = h & ((1L << wb) - 1)
        val r = if (w == 0) wb + 1
          else (wb + 1) - (64 - java.lang.Long.numberOfLeadingZeros(w))
        regs(idx) = math.max(regs.getOrElse(idx, 0), r)
      }
      val filled = regs.size
      val sScaled = regs.values.map(r => 1L << (wb + 1 - r)).sum +
        (Relational.HllM - filled).toLong * (1L << (wb + 1))
      val v = Relational.HllM - filled
      val eRaw = Relational.HllC / sScaled
      val est = if (v > 0 && eRaw <= Relational.HllLinThresh)
        Relational.HllLinTable(v - 1) else eRaw
      (v, sScaled, est)
    }
    def check(corpusDir: String): Seq[(String, Int, Long, Long)] = {
      val byType = Tables.events(s, corpusDir)
        .select("event_type", "user_id").collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val want = (byType.map { case (t, us) =>
        val (v, ss, e) = replay(us); (t, v, ss, e)
      }.toSeq :+ {
        val (v, ss, e) = replay(byType.values.flatten); ("~all", v, ss, e)
      }).sortBy(_._1)
      val got = Relational.q40HllDistinct(s, corpusDir).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == want, s"register/estimate replay at $corpusDir")
      got
    }
    val gate = check(dir)
    // accuracy on the real corpus: within 4 sigma of HLL error (1.04/8)
    val exact = Tables.events(s, dir).select("event_type", "user_id")
      .distinct().collect().map(r => r.getString(0)).groupBy(identity)
      .view.mapValues(_.length).toMap
    gate.filter(_._1 != "~all").foreach { case (t, _, _, est) =>
      val n = exact(t)
      assert(math.abs(est.toDouble - n) / n < 4 * 1.04 / 8, s"$t err")
    }
    // planted corpus: DISJOINT user sets per type (the gate corpus has
    // every user in every type, so its merge is trivially idempotent)
    // + one 2000-user type to force the raw branch next to linear ones
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-q40").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0L until 10L).map(u => (ts, u, "a")) ++
      (10L until 25L).map(u => (ts, u, "b")) ++
      (0L until 30L).map(u => (ts, u, "c")) ++
      (0L until 2000L).map(u => (ts, u, "d"))
    rows.toDF("ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val planted = check(out).map(r => r._1 -> r).toMap
    // both branches fired: a/b/c are linear-counting range, d is raw
    assert(planted("a")._2 > 0 && planted("d")._2 == 0, "branch coverage")
    assert(planted("a")._4 != planted("d")._4, "types must differ")
    // the merge is non-trivial: ~all fills at least as many registers
    // as any input and its estimate tracks the 2000-user union
    assert(planted("~all")._2 <= Seq("a", "b", "c", "d")
      .map(planted(_)._2).min, "merged sketch fills most registers")
    assert(math.abs(planted("~all")._4 - 2000.0) / 2000 < 4 * 1.04 / 8,
      "merged estimate tracks the union cardinality")
  }

  test("q41 sessionize matches a driver-side replay; exact-gap boundary " +
      "stays in-session; simultaneous events tie-break on event_id; " +
      "one hash exchange") {
    import graft.operators.Relational
    val gapUs = Relational.SessionGapHours.toLong * 3600L * 1000000L
    def replay(evts: Seq[(Long, Long, String, Long)]) // (user, eid, type, tus)
        : Seq[(Long, Long, Long, Long, Long, Int, Long)] =
      evts.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._4, e._2))
        var seq = 0L
        var prev = Long.MinValue
        val tagged = sorted.map { e =>
          if (prev == Long.MinValue || e._4 - prev > gapUs) seq += 1
          prev = e._4
          (seq, e)
        }
        tagged.groupBy(_._1).toSeq.map { case (sq, ses) =>
          val ts = ses.map(_._2._4)
          (u, sq, ses.length.toLong, ts.min, ts.max,
            ses.map(_._2._3).distinct.length, ts.max - ts.min)
        }
      }.sortBy(r => (r._1, r._2))
    val raw = Tables.events(s, dir)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    val df = Relational.q41SessionizeBatch(s, dir)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5), r.getLong(6)))
      .toSeq
    assert(got == replay(raw), "gate-corpus session replay")
    assert(got.exists(_._3 > 1), "multi-event sessions exist (gap choice)")
    // plan: exactly one HASH exchange (window + session agg share it);
    // anything else is the final ORDER BY's presentation range exchange
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val hashEx = TestSpark.flattenPlan(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
      .filter(_.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    assert(hashEx.length == 1,
      s"expected one hash exchange:\n${df.queryExecution.executedPlan}")
    // planted boundary corpus: user 1 has an EXACT-gap pair (same
    // session, rule is <=) then a gap+1us jump (new session); user 2
    // has two simultaneous events ordered by event_id
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-q41").toString
    def t(us: Long) = us
    val planted = Seq(
      (1L, 10L, "view", t(0L)),
      (1L, 11L, "click", t(gapUs)),          // == gap: same session
      (1L, 12L, "view", t(2 * gapUs + 1)),   // gap+1us: new session
      (2L, 20L, "view", t(500L)),
      (2L, 21L, "click", t(500L)),           // simultaneous, eid order
      (2L, 22L, "purchase", t(500L + gapUs + 1)))
    planted.toDF("user_id", "event_id", "event_type", "us")
      .selectExpr("user_id", "event_id", "event_type",
        "timestamp_micros(us) AS ts")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val pGot = Relational.q41SessionizeBatch(s, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getLong(6))).toSeq
    assert(pGot == replay(planted), "planted boundary replay")
    assert(pGot.head == (1L, 1L, 2L, 0L, gapUs, 2, gapUs),
      "exact-gap pair must share a session")
    assert(pGot.map(r => (r._1, r._2, r._3)).toSet ==
      Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 2L), (2L, 2L, 1L)))
  }

  test("q43 rolling peak matches a driver-side replay; same-day peers " +
      "share one RANGE frame; all windows ride one hash exchange") {
    import graft.operators.Relational
    import org.apache.spark.sql.functions.{col, to_date, datediff, lit}
    val base = Tables.orders(s, dir)
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("day"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val want = base.groupBy(_._1).map { case (ck, os) =>
      // RANGE semantics: every row of a (cust, day) gets the frame of
      // ALL rows within the trailing window, same-day peers included
      val rows = os.map { case (_, d, p) =>
        val in = os.filter(o => o._2 >= d - (Relational.RollDays - 1) &&
          o._2 <= d)
        val cents = in.map(o => BigDecimal(o._3).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum
        (d, in.length.toLong, cents)
      }
      val pkCnt = rows.map(_._2).max
      val pkSum = rows.map(_._3).max
      val pkDay = rows.filter(_._2 == pkCnt).map(_._1).min
      (ck, pkCnt, pkSum.toDouble, pkDay)
    }.toSeq.sortBy(_._1)
    val df = Relational.q43RollingWindow(s, dir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got == want, "driver replay of the rolling peak")
    assert(got.exists(_._2 > 1), "peaks above 1 exist (window binds)")
    // plan: one hash exchange feeds all four windows + the final agg
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val hashEx = TestSpark.flattenPlan(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
      .filter(_.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    assert(hashEx.length == 1,
      s"expected one hash exchange:\n${df.queryExecution.executedPlan}")
  }

  test("q32 funnel matches a driver-side replay and is monotone") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val evts = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evts.groupBy(_._1)
    def first(rows: Array[(Long, String, Long)], t: String): Option[Long] = {
      val ts = rows.filter(_._2 == t).map(_._3)
      if (ts.isEmpty) None else Some(ts.min)
    }
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.values.foreach { rows =>
      val (v, c, p) =
        (first(rows, "view"), first(rows, "click"), first(rows, "purchase"))
      val s1 = v.isDefined
      val s2 = s1 && c.isDefined && c.get >= v.get
      val s3 = s2 && p.isDefined && p.get >= c.get
      if (s1) n1 += 1; if (s2) n2 += 1; if (s3) n3 += 1
    }
    val got = Relational.q32Funnel(s, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "view", n1), (2, "view>click", n2),
      (3, "view>click>purchase", n3)))
    assert(n1 >= n2 && n2 >= n3, "funnel must be monotone")
    assert(n1 > 0, "funnel entry stage empty")
  }

  test("q34 retention matrix matches a driver-side replay; offset-0 is the cohort size") {
    import org.apache.spark.sql.functions.{col, expr}
    val days = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val cohort = days.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expect = days
      .map { case (u, d) => (cohort(u), d - cohort(u)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Relational.q34RetentionCohorts(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    // every user is active on their first day, so offset 0 counts the
    // whole cohort and no later offset can exceed it
    val sizes = cohort.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.foreach { case ((c, off), n) =>
      assert(n <= sizes(c), s"cohort $c offset $off exceeds cohort size")
      if (off == 0L) assert(n == sizes(c), s"cohort $c day-0 != size")
    }
    assert(got.keys.exists(_._2 > 0), "matrix has no retention tail")
  }

  test("q35 CMS matches a driver replay; collisions overcount on a wide vocab") {
    import org.apache.spark.sql.functions.col
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(d: Int, w: String): Long = {
      val dig = md.digest(s"$d|$w".getBytes("UTF-8"))
      val v = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      v % Relational.CmsWidth
    }
    def replay(counts: Map[String, Long]): Map[String, (Long, Long)] = {
      val cells = new scala.collection.mutable.HashMap[(Int, Long), Long]()
      counts.foreach { case (w, c) =>
        (0 until Relational.CmsDepth).foreach { d =>
          val k = (d, h(d, w)); cells(k) = cells.getOrElse(k, 0L) + c
        }
      }
      Relational.CmsProbes.map { w =>
        val est = (0 until Relational.CmsDepth)
          .map(d => cells.getOrElse((d, h(d, w)), 0L)).min
        w -> (counts.getOrElse(w, 0L), est)
      }.toMap
    }
    val real = Tables.documents(s, dir).select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = replay(real)
    val got = Relational.q35CmsTopk(s, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
    got.values.foreach { case (t, e) => assert(e >= t, "CMS must upper-bound") }
    // planted 3000-word vocab >> 256 buckets (λ ≈ 11.7 words/cell,
    // P[any cell empty] ≈ 1024·e^-11.7 ≈ 0.8%): every row's cells fill
    // up, so absent probes must collide into positive estimates (600
    // words was NOT enough — each row kept ~25 empty cells and all six
    // probes deterministically found one)
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-q35").toString
    val planted = (0 until 3000).map(i =>
      (i.toLong, Array.fill(i % 5 + 1)(s"w$i").mkString(" ")))
    planted.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val pGot = Relational.q35CmsTopk(s, out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pCounts = planted.flatMap(_._2.split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pExpect = replay(pCounts)
    pGot.foreach { case (w, t, e, over) =>
      assert((t, e) == pExpect(w), s"probe $w")
      assert(e >= t && over == e - t)
    }
    assert(pGot.forall(_._2 == 0L), "probes are absent from the planted vocab")
    assert(pGot.exists(_._4 > 0L),
      "no collision overcount — sketch audit untested")
  }

  test("q33 quantiles match a driver-side exact interpolation in cents") {
    import org.apache.spark.sql.functions.{col, expr}
    val cents = Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def interp(v: Array[Long], q: Double): Double = {
      val rp = q * (v.length - 1)
      val lo = rp.toLong; val hi = math.ceil(rp).toLong
      if (lo == hi) v(lo.toInt).toDouble
      else v(lo.toInt) * (hi - rp) + v(hi.toInt) * (rp - lo)
    }
    val got = Relational.q33Quantiles(s, dir).collect()
    assert(got.map(_.getString(0)).sorted.sameElements(cents.keys.toArray.sorted))
    got.foreach { r =>
      val v = cents(r.getString(0))
      assert(r.getLong(1) == v.length)
      assert(r.getLong(2) == v.head && r.getLong(6) == v.last)
      // quartile fracs are exact binary doubles ⇒ the comparison is
      // BIT-exact, no tolerance — the same property the oracle relies on
      assert(r.getDouble(3) == interp(v, 0.25), "p25")
      assert(r.getDouble(4) == interp(v, 0.5), "p50")
      assert(r.getDouble(5) == interp(v, 0.75), "p75")
      assert(r.getDouble(3) <= r.getDouble(4) && r.getDouble(4) <= r.getDouble(5))
    }
  }

  test("q37 co-occurrence matches a driver replay and the cap genuinely binds") {
    import org.apache.spark.sql.functions.{col, expr, get_json_object}
    val clicks = Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // the power-user hazard must be present in the corpus, or the test
    // (and the operator's scale story) exercises nothing
    val profileSizes = clicks.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.length).toMap
    assert(profileSizes.values.exists(_ > Relational.CoocCap),
      s"no user exceeds the cap at $dir — cap untested")
    // replay: per-user (clicks desc, item) top-C profile, then pairs
    val capped = clicks.groupBy(_._1).view.mapValues { xs =>
      xs.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (item, n) => (-n, item) }
        .take(Relational.CoocCap).map(_._1).toSet
    }.toMap
    val pairCounts = capped.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }
      .take(Relational.CoocTopK)
    val got = Relational.q37Cooccur(s, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == pairCounts, "co-occurrence top-k != driver replay")
    // the pair explosion stays capped: no profile feeds more than
    // C(C-1)/2 pairs
    val plan = Relational.q37Cooccur(s, dir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "final top-k must be TakeOrdered, not a global sort")
  }

  test("q38 transition matrix: exact replay, permille rows, conservation") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val transitions = ev.groupBy(_._1).values.flatMap { es =>
      val seq = es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
      seq.zip(seq.tail)
    }.toSeq
    val cnt = transitions.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = cnt.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val expected = cnt.toSeq.map { case ((p, n), c) =>
      (p, n, c, 1000L * c / rowTot(p))
    }.sortBy(t => (t._1, t._2))
    val got = Relational.q38Transitions(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "transition matrix != driver replay")
    // conservation: every user contributes (events - 1) transitions
    val users = ev.map(_._1).distinct.length
    assert(got.map(_._3).sum == ev.length - users)
    // each row's permille mass is ≤ 1000 and within truncation slack
    got.groupBy(_._1).foreach { case (p, rows) =>
      val mass = rows.map(_._4).sum
      assert(mass <= 1000 && mass > 1000 - rows.length,
        s"row $p permille mass $mass out of floor-division range")
    }
  }

  test("q39 nearest-rank tails: driver replay + approx_percentile bound") {
    import org.apache.spark.sql.functions._
    val cents = Tables.lineitem(s, dir)
      .selectExpr("l_returnflag",
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents")
    val data = cents.collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toIndexedSeq).toMap
    def targetRank(q: Int, n: Int): Int = ((q.toLong * n + 99) / 100).toInt
    val rows = Relational.q39TailQuantiles(s, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getString(0); val xs = data(g); val n = xs.length
      assert(r.getLong(1) == n)
      def at(q: Int) = xs(targetRank(q, n) - 1)
      assert(r.getLong(2) == at(90), s"$g p90")
      assert(r.getLong(3) == at(95), s"$g p95")
      assert(r.getLong(4) == at(99), s"$g p99")
      // tails genuinely discriminate from the median region
      assert(at(99) >= at(95) && at(95) >= at(90))
    }
    // the sketch path a 100 TB caller takes: approx_percentile's GK
    // sketch guarantees rank error <= n/accuracy — quantify it against
    // the exact nearest-rank values instead of trusting it
    val acc = 1000
    val approx = cents.groupBy("l_returnflag")
      .agg(expr(
        s"approx_percentile(cents, array(0.90D, 0.95D, 0.99D), $acc)")
        .as("ap"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { r =>
      val g = r.getString(0); val xs = data(g); val n = xs.length
      val eps = math.max(1L, n.toLong / acc) + 1
      Seq(90, 95, 99).zipWithIndex.foreach { case (q, i) =>
        val v = approx(g)(i)
        val lo = xs.count(_ < v) + 1 // v occupies sorted ranks [lo, hi]
        val hi = xs.count(_ <= v)
        val target = targetRank(q, n)
        assert(lo - eps <= target && target <= hi + eps,
          s"$g p$q: approx $v at ranks [$lo,$hi], target $target ±$eps")
      }
    }
  }

  test("q48 robust outliers match a driver-side median/MAD replay; " +
      "the integer cut equals the float definition on this corpus") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Relational.q48RobustOutliers(s, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("med_cents"),
          r.getAs[Long]("mad_cents"), r.getAs[Long]("n_outliers"),
          r.getAs[Long]("max_dev"))).toMap
    val rows = Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def medNR(xs: Seq[Long]): Long = {
      val srt = xs.sorted
      srt(((50L * srt.size + 99) / 100 - 1).toInt) // 1-indexed rank
    }
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val cents = grp.map(_._2).toSeq
      val med = medNR(cents)
      val devs = cents.map(c => math.abs(c - med))
      val mad = medNR(devs)
      val nOut = devs.count(d => d * 10000L > mad * Relational.Q48Cut)
      assert(got(g) == ((cents.size.toLong, med, mad, nOut.toLong,
        devs.max)), s"group $g mismatch vs driver replay")
      // the fixed-point cut agrees with the float 3*1.4826 rule here
      val nOutF = devs.count(d => d.toDouble > 3.0 * 1.4826 * mad)
      assert(nOut == nOutF,
        s"group $g: integer cut diverged from the float definition")
    }
  }

  test("q50 skyline equals the brute-force dominance definition and " +
      "is a genuine antichain; dominated rows are provably dominated") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Relational.q50Skyline(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver replay of the aggregation + the quadratic definition
    val agg = Tables.orders(s, dir)
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, rs) =>
        val n = rs.size.toLong
        (k, n, rs.map(_._2).sum / n)
      }.toSeq
    def dominates(b: (Long, Long, Long), a: (Long, Long, Long)): Boolean =
      b._2 >= a._2 && b._3 <= a._3 && (b._2 > a._2 || b._3 < a._3)
    val expected = agg.filter(a => !agg.exists(b => dominates(b, a)))
      .sortBy(_._1)
    assert(got.toSeq == expected)
    assert(got.length > 1, "frontier degenerated to a single row")
    // antichain: no member dominates another
    got.foreach(a => got.foreach(b =>
      assert(a == b || !dominates(b, a), s"$b dominates $a in frontier")))
    // every excluded customer has a concrete dominator
    val inF = got.toSet
    agg.filterNot(inF).foreach(a =>
      assert(agg.exists(b => dominates(b, a)), s"$a excluded undominated"))
  }

  test("q51 rules match a driver replay off the capped profiles; " +
      "confidence bounded; lift discriminates both directions of 1000") {
    val got = graft.operators.Relational.q51AssocRules(s, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val capped = graft.operators.Relational.cappedClickProfiles(s, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val supp = capped.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nUsers = capped.map(_._1).distinct.length.toLong
    val byUser = capped.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val pairCnt = byUser.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= graft.operators.Relational.AssocMinSupport)
    val allRules = pairCnt.toSeq.flatMap { case (Seq(a, b), nab) =>
      Seq((a, b, nab), (b, a, nab)) }
      .map { case (a, b, nab) =>
        val (na, nb) = (supp(a), supp(b))
        (a, b, nab, na, nb, 1000 * nab / na,
          (BigInt(1000) * nab * nUsers / (BigInt(na) * nb)).toLong) }
    val rules = allRules
      .sortBy(t => (-t._6, -t._7, t._1, t._2))
      .take(graft.operators.Relational.AssocTopK)
    assert(got.toSeq == rules)
    assert(got.forall(r => r._6 >= 0 && r._6 <= 1000), "conf out of range")
    assert(allRules.exists(_._7 > 1000), "no positive association found")
    // lift separates positive from negative association over the FULL
    // rule set (the top-k, ranked by confidence, is legitimately all
    // positive-association — that is what the ranking is for). The
    // gate corpus (15 users) is too small for a sub-independence pair
    // to clear the support floor, so the negative side is asserted at
    // sf0.01 (150 users; measured min lift 618 vs max 5769).
    val rules01 = graft.operators.Relational
      .q51AssocRules(s, "/root/testdata/sf0.01")
    val lifted = graft.operators.Relational
      .cappedClickProfiles(s, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val supp01 = lifted.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n01 = lifted.map(_._1).distinct.length.toLong
    val neg = lifted.groupBy(_._1).values.toSeq
      .flatMap(_.map(_._2).toSet.toSeq.sorted.combinations(2))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= graft.operators.Relational.AssocMinSupport)
      .exists { case (Seq(a, b), nab) =>
        BigInt(1000) * nab * n01 / (BigInt(supp01(a)) * supp01(b)) < 1000 }
    assert(neg, "sf0.01: lift never dropped below 1000")
    assert(rules01.count() == graft.operators.Relational.AssocTopK)
  }

  test("q52 decayed trending matches a driver replay; the horizon " +
      "genuinely truncates; weights are exact powers of two") {
    import org.apache.spark.sql.functions._
    val K = graft.operators.Relational.DecayHorizon
    val got = graft.operators.Relational.q52DecayTrend(s, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val clicks = Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .select(get_json_object(col("props"), "$.k").cast("int").as("item"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .filter(col("item").isNotNull)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val ref = clicks.map(_._2).max
    val expected = clicks.groupBy(_._1).map { case (item, cs) =>
      val ages = cs.map(ref - _._2)
      (item, ages.count(_ < K).toLong,
        ages.filter(_ < K).map(a => 1L << (K - 1 - a).toInt).sum)
    }.toSeq.sortBy(t => (-t._3, t._1))
      .take(graft.operators.Relational.DecayTopK)
    assert(got.toSeq == expected)
    // the horizon bites: clicks exist beyond it, and some trending
    // item's windowed count is strictly below its all-time count
    assert(clicks.exists(c => ref - c._2 >= K), "corpus fits horizon")
    val allTime = clicks.groupBy(_._1).view.mapValues(_.length.toLong)
    assert(got.exists(t => t._2 < allTime(t._1)),
      "no trending item had any click truncated")
    // freshness re-ranks: decay order differs from the raw-count order
    val rawTop = allTime.toSeq.sortBy(t => (-t._2, t._1))
      .take(graft.operators.Relational.DecayTopK).map(_._1)
    assert(got.map(_._1).toSeq != rawTop,
      "decay ranking identical to raw counts — no freshness signal")
  }

  test("q28 re-aggregated rollup is bit-identical to the Expand-based " +
    ".rollup spelling") {
    import org.apache.spark.sql.functions._
    import graft.operators.Exact
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (Option(r.get(0)), Option(r.get(1)), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))
    }.toSeq
    val got = rows(graft.operators.Relational.q28RollupAgg(s, dir))
    val rollup = rows(graft.Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("cnt"),
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first))
    assert(got.nonEmpty && got == rollup)
  }
}
