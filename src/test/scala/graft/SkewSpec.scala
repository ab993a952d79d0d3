package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.streaming.Streams

class SkewSpec extends AnyFunSuite {

  test("saltedJoin equals the plain join on a pathologically hot key") {
    val s = TestSpark.spark
    import s.implicits._
    // 10k rows, 90% on one key — the shape AQE's splitter can't always fix
    val large = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong))
      .toDF("k", "v")
    val small = (0L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = large.join(small, "k")
    val salted = Skew.saltedJoin(large, small, "k", salt = 8)

    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.count() === plain.count())
    val a = plain.orderBy("k", "v").collect().map(_.toSeq)
    val b = salted.orderBy("k", "v").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("stream-to-parquet sink drains with AvailableNow and checkpoints") {
    val s = TestSpark.spark
    import s.implicits._
    val root = Files.createTempDirectory("graft_stream_sink")
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    val input = MemoryStream[String](s)
    input.addData("a b", "b c")
    // stateless transform → append-mode file sink (aggregating flows use
    // the memory/foreachBatch paths exercised in StreamsSpec)
    def tokens = input.toDF()
      .select(explode(split(col("value"), " ")).as("word"))
      .filter(col("word") =!= "")

    Streams.toParquet(tokens, out, ckpt)
    assert(s.read.parquet(out).count() === 4)

    // second drain picks up ONLY post-checkpoint data
    input.addData("d")
    Streams.toParquet(tokens, out, ckpt)
    val words = s.read.parquet(out).orderBy("word")
      .collect().map(_.getString(0)).toSeq
    assert(words === Seq("a", "b", "b", "c", "d"))
  }

  test("dedup streaming sink is idempotent per key across batches") {
    val s = TestSpark.spark
    import s.implicits._
    val root = Files.createTempDirectory("graft_dedup_sink")
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    val input = MemoryStream[(Long, String)](s)
    def src = input.toDF().toDF("k", "v")

    input.addData((1L, "a"), (2L, "b"))
    Streams.toParquetDedup(src, out, ckpt, key = "k")
    // new batch re-sends k=2 and adds k=3: only k=3 lands
    input.addData((2L, "b"), (3L, "c"))
    Streams.toParquetDedup(src, out, ckpt, key = "k")

    val ks = s.read.parquet(out).orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(ks === Seq(1L, 2L, 3L))
  }
}
