package graft

import org.apache.spark.sql.functions.{col, expr, hex}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.SfDir

  test("media table carries binary payload + typed metadata") {
    val mt = Multimodal.mediaTable(s, dir)
    val schema = mt.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val r = mt.orderBy("doc_id").limit(1).collect()(0)
    val payload = r.getAs[Array[Byte]]("payload")
    assert(payload.nonEmpty)
  }

  test("m1 decode is deterministic and covers every document") {
    val a = Multimodal.m1Decode(s, dir).collect()
    val b = Multimodal.m1Decode(s, dir).collect()
    assert(a.length == Tables.documents(s, dir).count())
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("resize bounds payloads and preserves identity for short ones") {
    val s = TestSpark.spark
    val out = graft.operators.Multimodal.resize(s, TestSpark.SfDir, targetLen = 64)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      assert(p.length <= 64)
      assert(r.getAs[Int]("n_bytes") === p.length)
    }
  }

  test("sampleFrames explodes each asset into every k-th fixed-size window") {
    val s = TestSpark.spark
    val frames = graft.operators.Multimodal
      .sampleFrames(s, TestSpark.SfDir, frameLen = 32, every = 4)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("frame_idx") % 4 === 0))
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length <= 32))
    // frame count per doc matches ceil(len/32) sampled every 4
    val docs = graft.operators.Multimodal.mediaTable(s, TestSpark.SfDir)
      .selectExpr("doc_id", "length(payload) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val byDoc = rows.groupBy(_.getLong(0)).view.mapValues(_.length.toLong)
    byDoc.foreach { case (id, cnt) =>
      val nFrames = (docs(id) + 31) / 32
      assert(cnt === (nFrames + 3) / 4)
    }
  }

  test("m2/m3 gate projections are lossless hex of the binary operators") {
    val s = TestSpark.spark
    val dir = TestSpark.SfDir
    def hx(b: Array[Byte]): String = b.map("%02X".format(_)).mkString
    val frames = graft.operators.Multimodal.sampleFrames(s, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> hx(r.getAs[Array[Byte]]("frame")))
      .toMap
    val m2 = graft.operators.Multimodal.m2FrameSample(s, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(m2 == frames)
    val resized = graft.operators.Multimodal.resize(s, dir).collect()
      .map(r => r.getLong(0) -> hx(r.getAs[Array[Byte]]("payload"))).toMap
    val m3 = graft.operators.Multimodal.m3ResizeMeta(s, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(m3 == resized)
    // hex must really exercise both nibble ranges (digits AND letters)
    assert(m2.values.exists(v => v.exists(_.isDigit) && v.exists(_.isLetter)))
  }

  test("d3Candidates surfaces hamming-close fingerprint pairs") {
    val s = TestSpark.spark
    val pairs = graft.operators.Dedup.d3Candidates(s, TestSpark.SfDir)
      .collect()
    // the corpus plants near-duplicate docs; they agree on high simhash
    // bits and sit within the hamming threshold
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= 6))
  }

  test("m1 features reflect the payload bytes (ascii corpus: n_bytes == n_chars)") {
    import org.apache.spark.sql.functions._
    val joined = Multimodal.m1Decode(s, dir)
      .join(Tables.documents(s, dir), "doc_id")
      .filter(col("n_bytes").cast("long") =!= col("n_chars"))
    assert(joined.count() == 0)
  }

  test("m4 fused kernel is bit-identical to the composed HOF spelling") {
    graft.functions.GraftFunctions.register(s)
    // the documented fallback spelling: hex + step-2 window series +
    // simhash60 — interpreted HOFs, same bits (incl. empty/short docs)
    val both = Multimodal.mediaTable(s, dir)
      .withColumn("hx", hex(col("payload")))
      .select(col("doc_id"),
        expr("payload_simhash(payload)").as("fused"),
        expr(s"simhash60(transform(sequence(1, greatest(length(hx) - " +
          s"${Multimodal.M4GramHex - 1}, 1), 2), " +
          s"i -> substring(hx, i, ${Multimodal.M4GramHex})))").as("hof"))
    assert(both.filter(col("fused") =!= col("hof")).count() == 0)
    // short-payload edges through the same parity
    val sess = s
    import sess.implicits._
    val edges = Seq(1L -> Array[Byte](), 2L -> Array[Byte](7),
      3L -> Array[Byte](1, 2, 3), 4L -> Array[Byte](1, 2, 3, 4))
      .toDF("doc_id", "payload")
      .withColumn("hx", hex(col("payload")))
      .select(
        expr("payload_simhash(payload)").as("fused"),
        expr(s"simhash60(transform(sequence(1, greatest(length(hx) - " +
          s"${Multimodal.M4GramHex - 1}, 1), 2), " +
          s"i -> substring(hx, i, ${Multimodal.M4GramHex})))").as("hof"))
    assert(edges.filter(col("fused") =!= col("hof")).count() == 0)
  }

  test("m4 banding equals brute-force hamming pairs on the payload fingerprints") {
    graft.functions.GraftFunctions.register(s)
    val fp = Multimodal.mediaTable(s, dir)
      .select(col("doc_id"), expr("payload_simhash(payload)").as("simhash"))
    val brute = fp.as("x").join(fp.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming", expr("bit_count(x.simhash ^ y.simhash)"))
      .filter(col("hamming") <= 6)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("hamming").cast("int").as("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = Multimodal.m4MediaDedup(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, "banding must have recall 1.0 vs brute force")
    assert(banded.nonEmpty, "synthetic corpus should contain near-dup payloads")
  }

  test("m4 flags a byte-perturbed re-upload near its original") {
    graft.functions.GraftFunctions.register(s)
    // plant: copy one payload, flipping a single byte — a
    // thumbnail-style perturbation; the copy must pair with its
    // original within the hamming threshold
    val one = Multimodal.mediaTable(s, dir)
      .orderBy("doc_id").limit(1)
      .select(col("doc_id"), col("payload")).collect()(0)
    val orig = one.getAs[Array[Byte]]("payload")
    val tweak = orig.clone(); if (tweak.length > 4) tweak(4) = (tweak(4) ^ 0x5a).toByte
    val sess = s
    import sess.implicits._
    val planted = Seq((1L, orig), (2L, tweak)).toDF("doc_id", "payload")
    val fp = planted
      .select(col("doc_id"), expr("payload_simhash(payload)").as("simhash"))
    val ham = fp.as("x").join(fp.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(expr("bit_count(x.simhash ^ y.simhash)")).head.getInt(0)
    // one perturbed byte changes ~8 of ~n_bytes gram instances: the
    // pair must sit FAR below the ~30-bit distance of unrelated
    // payloads (each changed gram shifts per-bit sums by O(1) against a
    // O(√n_grams) margin)
    assert(ham <= 15, s"one-byte perturbation moved the fingerprint $ham bits")
  }

  test("m5 media pack matches a driver replay; sequences genuinely aggregate payloads") {
    val docs = Tables.documents(s, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8").length))
    val expected = docs
      .map { case (id, nb) => (id, (id % Multimodal.M5PackShards).toInt, nb) }
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(_._1).map { case (id, shard, nb) =>
          val seq = (cum / Multimodal.M5PackBudget).toInt
          cum += nb
          (id, shard, nb, seq)
        }
      }.sortBy(_._1)
    val got = Multimodal.m5MediaPack(s, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == expected, "media packing != driver replay")
    // the budget genuinely aggregates: some sequence holds >1 payload,
    // and no sequence's exclusive-prefix start exceeds the budget rule
    val perSeq = got.groupBy(r => (r._2, r._4)).values.map(_.size)
    assert(perSeq.exists(_ > 1), "no sequence packed more than one payload")
    assert(got.map(_._4).max > 0, "budget never rolled over a sequence")
  }
}
