package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_sources").toString

  test("typed csv ingest coerces columns and quarantines malformed rows") {
    val s = TestSpark.spark
    val dir = tmpDir()
    val csv = s"""trip_id,vendor_id,pickup_datetime,dropoff_datetime,passenger_count,trip_distance,pickup_longitude,pickup_latitude,dropoff_longitude,dropoff_latitude,payment_type,fare_amount,tip_amount,total_amount
                 |1,VTS,2015-01-01 00:01:00,2015-01-01 00:11:00,2,1.5,-73.99,40.75,-73.98,40.76,CRD,9.5,1.0,10.5
                 |2,CMT,2015-01-01 00:02:00,2015-01-01 00:12:00,1,3.2,-73.97,40.74,-73.95,40.71,CSH,12.0,0.0,12.0
                 |notanumber,XXX,zzz,zzz,a,b,c,d,e,f,g,h,i,j""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "taxi.csv"), csv.getBytes)

    // cache first: Spark disallows queries that touch only the internal
    // corrupt-record column of a raw CSV scan
    val df = Sources.csv(s, s"$dir/taxi.csv", Sources.taxiSchema).cache()
    assert(df.schema("passenger_count").dataType === IntegerType)
    assert(df.schema("pickup_datetime").dataType === TimestampType)
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() === 2)
    assert(bad.count() === 1)
    assert(good.agg(sum("fare_amount")).head.getDouble(0) === 21.5)
  }

  test("jsonl ingest reads nested records and array columns, flattens") {
    val s = TestSpark.spark
    val dir = tmpDir()
    val jsonl =
      """{"id": 1, "user": {"name": "ann", "followers": 10}, "tags": ["a", "b"]}
        |{"id": 2, "user": {"name": "bo", "followers": 20}, "tags": []}""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "tweets.jsonl"), jsonl.getBytes)

    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("user", StructType(Seq(
        StructField("name", StringType),
        StructField("followers", LongType)))),
      StructField("tags", ArrayType(StringType))))
    val df = Sources.jsonl(s, s"$dir/tweets.jsonl", schema)
    val flat = Sources.flattenStruct(df, "user")
    assert(flat.columns.toSet === Set("id", "tags", "user_name", "user_followers"))
    assert(flat.filter(col("user_name") === "ann").head.getAs[Long]("user_followers") === 10L)
    val exploded = df.select(explode(col("tags")).as("tag"))
    assert(exploded.count() === 2)
  }

  test("bucketed tables co-locate: same-bucket join plans with no shuffle") {
    val s = TestSpark.spark
    Sources.writeBucketed(
      Tables.orders(s, TestSpark.SfDir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", 4)
    Sources.writeBucketed(
      Tables.customer(s, TestSpark.SfDir).select("c_custkey", "c_nationkey"),
      "customer_b", "c_custkey", 4)
    // force the shuffle-or-not decision to be about bucketing, not size
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("orders_b").join(
        s.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === Tables.orders(s, TestSpark.SfDir).count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("orc round-trips losslessly and pushes filters to the scan") {
    val s = TestSpark.spark
    val out = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val src = Tables.orders(s, TestSpark.SfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    Sources.writeOrc(src, s"$out/orders.orc")
    val back = Sources.orc(s, s"$out/orders.orc", src.schema)
    // lossless round-trip, exact values
    assert(back.count() == src.count())
    val a = src.collect().map(_.toSeq).sortBy(_.toString)
    val b = back.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
    // filter + projection reach the ORC scan like they do on parquet
    val q = back.filter(col("o_custkey") === 42L).select("o_orderkey")
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,42)"),
      s"filter not pushed to ORC scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>"),
      s"projection not pruned at ORC scan:\n$scan")
  }

  test("appendOnce is idempotent per key across re-runs") {
    val s = TestSpark.spark
    import s.implicits._
    val sink = tmpDir() + "/sink"
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val batch2 = Seq((2L, "b"), (3L, "c")).toDF("k", "v") // overlaps on k=2

    assert(Sources.appendOnce(s, batch1, sink, "k") === 2)
    assert(Sources.appendOnce(s, batch1, sink, "k") === 0) // exact re-run: no-op
    assert(Sources.appendOnce(s, batch2, sink, "k") === 1) // only k=3 lands
    val out = s.read.parquet(sink).orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
  }

  test("fetchMany fans out per-file copies and quarantines failures as rows") {
    val s = TestSpark.spark
    val src = tmpDir()
    val landing = tmpDir() + "/landing"
    Files.writeString(java.nio.file.Paths.get(src, "a.csv"), "k,v\n1,x\n")
    Files.writeString(java.nio.file.Paths.get(src, "b.csv"), "k,v\n2,y\n3,z\n")
    val manifest = Sources.fetchMany(s, Seq(
      "a.csv" -> s"$src/a.csv",
      "b.csv" -> s"$src/b.csv",
      "missing.csv" -> s"$src/nope.csv"), landing).collect()
    val byId = manifest.map(r => r.getString(0) -> r).toMap
    assert(byId.keySet === Set("a.csv", "b.csv", "missing.csv"))
    assert(byId("a.csv").getBoolean(4) && byId("b.csv").getBoolean(4))
    assert(!byId("missing.csv").getBoolean(4))
    assert(byId("missing.csv").getString(5) != null) // quarantined error msg
    // landed files are real and readable by the typed CSV source
    assert(Files.exists(java.nio.file.Paths.get(landing, "a.csv")))
    val landed = s.read.option("header", "true").csv(s"$landing/b.csv")
    assert(landed.count() === 2)
    // re-fetch is idempotent (overwrite, not duplicate)
    val again = Sources.fetchMany(s, Seq("a.csv" -> s"$src/a.csv"), landing)
    assert(again.filter(col("ok")).count() === 1)
  }

  test("mergeIntoPartitioned rewrites ONLY the touched partitions") {
    val s = TestSpark.spark
    import s.implicits._
    val t = "graft_merge_spec"
    s.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), t)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
    Sources.writePartitioned(
      (0L until 100L).map(id => (id, s"v$id", id % 4)).toDF("k", "v", "pt"),
      t, "pt")
    def fileStamps(part: Long): Map[String, Long] = {
      val d = new org.apache.hadoop.fs.Path(loc, s"pt=$part")
      fs.listStatus(d).map(st =>
        st.getPath.getName -> st.getModificationTime).toMap
    }
    val untouchedBefore = fileStamps(3)
    // upsert one NEW key (pt 0) + one CHANGED key (pt 1); delete pt 2
    Sources.mergeIntoPartitioned(s, t, "pt", "k",
      upserts = Seq((200L, "brand-new", 0L), (1L, "changed", 1L))
        .toDF("k", "v", "pt"),
      deleteKeys = Seq((2L, 2L)).toDF("k", "pt"))
    val got = s.table(t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(200L) == "brand-new" && got(1L) == "changed")
    assert(!got.contains(2L), "deleted key survived the merge")
    assert(got(3L) == "v3" && got.size == 100)
    // the untouched partition's files were neither rewritten nor added
    assert(fileStamps(3) == untouchedBefore,
      "merge rewrote a partition no changeset key lives in")
  }

  test("mergeIntoPartitioned drops a partition whose last row is deleted") {
    val s = TestSpark.spark
    import s.implicits._
    val t = "graft_merge_empty_spec"
    s.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), t)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
    // partition 7 holds exactly ONE row; partition 1 holds many
    Sources.writePartitioned(
      ((0L until 20L).map(id => (id, s"v$id", 1L)) :+ (99L, "lonely", 7L))
        .toDF("k", "v", "pt"),
      t, "pt")
    // dynamic overwrite can't land an empty partition — deleting the
    // last row of pt=7 must still empty it (the erase-a-whole-directory
    // case), alongside a normal in-place delete in pt=1
    Sources.mergeIntoPartitioned(s, t, "pt", "k",
      upserts = Seq.empty[(Long, String, Long)].toDF("k", "v", "pt"),
      deleteKeys = Seq((99L, 7L), (3L, 1L)).toDF("k", "pt"))
    val got = s.table(t).collect().map(_.getLong(0)).toSet
    assert(!got.contains(99L), "sole row of its partition survived the merge")
    assert(!got.contains(3L) && got.size == 19)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(loc, "pt=7")),
      "emptied partition directory left behind")
    // idempotent: re-applying the same deletes is a clean no-op
    Sources.mergeIntoPartitioned(s, t, "pt", "k",
      upserts = Seq.empty[(Long, String, Long)].toDF("k", "v", "pt"),
      deleteKeys = Seq((99L, 7L), (3L, 1L)).toDF("k", "pt"))
    assert(s.table(t).count() == 19)
  }
}
