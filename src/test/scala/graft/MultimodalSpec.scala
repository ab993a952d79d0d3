package graft

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
}
