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

  test("m1 features reflect the payload bytes (ascii corpus: n_bytes == n_chars)") {
    import org.apache.spark.sql.functions._
    val joined = Multimodal.m1Decode(s, dir)
      .join(Tables.documents(s, dir), "doc_id")
      .filter(col("n_bytes").cast("long") =!= col("n_chars"))
    assert(joined.count() == 0)
  }
}
