package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, batch-decoded per partition.
  *
  * The decode step is a clearly-marked deterministic STUB (the container
  * has no image/audio codecs); everything Spark-side is real — binary
  * column, metadata struct, partition-batched decode with a typed
  * Dataset, flat numeric feature output. Swapping [[stubDecode]] for a
  * JNI/codec call changes nothing in the plan shape.
  */
object Multimodal {

  /** Typed record entering the decoder: payload + metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte],
      media_type: String, declared_len: Long)

  /** Typed decoded feature row. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      f_first: Double, f_mean: Double, f_hash: Double)

  /** STUB decoder: a real implementation would decode the image/audio
    * payload here; this one derives a deterministic fake feature vector
    * from the raw bytes so the plumbing is testable end-to-end. */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val bs = r.payload
    val n = bs.length
    val first = if (n > 0) (bs(0) & 0xff).toDouble else 0.0
    var sum = 0L
    var i = 0
    while (i < n) { sum += (bs(i) & 0xff); i += 1 }
    val mean = if (n > 0) sum.toDouble / n else 0.0
    val hash = (sum * 31 + n) % 997
    MediaFeatures(r.doc_id, r.media_type, n, first, mean, hash.toDouble)
  }

  /** Stage documents as a multimodal table: binary payload + metadata
    * struct. In production the payload column is real image/audio bytes;
    * here it's the utf-8 text so results are deterministic. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        concat(lit("synthetic/"), col("source")).as("media_type"),
        col("n_chars").as("declared_len"),
        col("lang").as("lang")).as("meta"))

  /** m1: decode the binary column per-partition into flat features.
    * mapPartitions keeps the decode batched (one iterator per task) —
    * the Scala analog of a vectorized/batched python UDF — and the
    * output is a flat numeric schema ready for downstream SQL. */
  def m1Decode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[MediaRecord] = mediaTable(s, dir).select(
      col("doc_id"), col("payload"),
      col("meta.media_type").as("media_type"),
      col("meta.declared_len").as("declared_len")).as[MediaRecord]
    ds.mapPartitions(_.map(stubDecode)).toDF()
      .orderBy("doc_id")
  }

  /** STUB resize: a real implementation decodes + resamples the image;
    * this one byte-subsamples the payload to `targetLen` deterministically
    * so the batched-transform plumbing (binary in → smaller binary out,
    * metadata preserved) is real and testable. */
  def stubResize(payload: Array[Byte], targetLen: Int): Array[Byte] = {
    val n = payload.length
    if (n <= targetLen) payload
    else Array.tabulate(targetLen)(i => payload((i.toLong * n / targetLen).toInt))
  }

  /** Resize pass over the media table: per-partition batched, output is
    * (doc_id, payload', meta + new length) — the plan shape of a decode/
    * re-encode stage in a real multimodal pipeline. */
  def resize(s: SparkSession, dir: String, targetLen: Int = 64): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("payload"), col("meta.media_type").as("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, p, mt) =>
        val r = stubResize(p, targetLen); (id, r, mt, r.length)
      })
      .toDF("doc_id", "payload", "media_type", "n_bytes")
  }

  /** STUB frame sampling: a real implementation pulls every k-th video
    * frame; this one emits every k-th fixed-size byte window so the
    * one-to-many (asset → frames) explode shape is real: output has a
    * frame index and per-frame payload, partitioned by source doc. */
  def sampleFrames(s: SparkSession, dir: String, frameLen: Int = 32,
                   every: Int = 4): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val frames = p.grouped(frameLen).zipWithIndex
        frames.collect { case (f, i) if i % every == 0 => (id, i, f) }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }

  /** m2: [[sampleFrames]] under the full gate — the one-to-many
    * (asset → frames) explode shape, presented as lossless hex (DuckDB
    * has no blob substring/md5, and hex is a stronger check than a
    * digest: every frame byte is compared). The product operator still
    * emits binary frames; this entry is its presentation projection. */
  def m2FrameSample(s: SparkSession, dir: String): DataFrame =
    sampleFrames(s, dir)
      .select(col("doc_id"), col("frame_idx"),
        hex(col("frame")).as("frame_hex"))
      .orderBy("doc_id", "frame_idx")

  /** m3: [[resize]] under the full gate — binary in → smaller binary
    * out with metadata preserved, hex-presented like [[m2FrameSample]]
    * so every resized byte is oracle-compared. */
  def m3ResizeMeta(s: SparkSession, dir: String): DataFrame =
    resize(s, dir)
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        hex(col("payload")).as("payload_hex"))
      .orderBy("doc_id")

  /** m4's gram width in HEX CHARS: 8 hex chars = 4 payload bytes per
    * gram — the byte-level analog of d3's word tokens, wide enough that
    * grams carry local structure, narrow enough that a small payload
    * edit perturbs few of them. The gram stream strides one BYTE
    * (every byte-aligned 4-byte window; see
    * [[graft.functions.TextHashKernels.payloadSimhash]]). */
  val M4GramHex = 8

  /** m4: near-duplicate MEDIA detection on the OPAQUE payload — no
    * decode, no codec: fingerprint = SimHash over every byte-aligned
    * 4-byte gram of the raw bytes (the fused `payload_simhash` kernel:
    * one codegen'd pass per row, no hex-string or gram-array
    * materialization), then d3's pigeonhole banding + hot-bucket split
    * finds every pair within the hamming threshold at recall 1.0.
    * This is the media half of corpus dedup (re-encoded thumbnails,
    * byte-shifted re-uploads, watermark-stamped copies cluster near
    * the original's fingerprint) and it runs BEFORE any decoder exists
    * in the pipeline — the shape web-scale image dedup uses, here over
    * the same banding machinery the text side already measured at
    * 10×/100× (SURVEY §5 d3 probes; the corpus side is one scan-local
    * fingerprint projection + the d3 candidate plan).
    *
    * The oracle recomputes the fingerprints from hex(payload) with a
    * step-2 gram series (hex stride 2 = byte stride 1) and brute-forces
    * all pairs (gate-scale n²) — so the banding's recall, not just the
    * fingerprint math, is hash-checked per SF, exactly like d7.
    * MultimodalSpec additionally pins the fused kernel bit-identical
    * to the composed HOF spelling. */
  def m4MediaDedup(s: SparkSession, dir: String,
      maxHamming: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val fp = mediaTable(s, dir)
      .select(col("doc_id"), expr("payload_simhash(payload)").as("simhash"))
    Dedup.d3CandidatesFromGroups(
      fp.groupBy("simhash")
        .agg(sort_array(collect_list(col("doc_id"))).as("members")),
      maxHamming, Dedup.D3HotBucketOcc)
  }

  /** m5 packing geometry: byte budget per training shard sequence
    * (payloads run 48–553 bytes on the synthetic corpus, so ~6 pack
    * per sequence) and the shard fan-out. */
  val M5PackBudget = 2048
  val M5PackShards = 4

  /** m5: MEDIA SHARD PACKING — c6's contiguous-fill sequence packing
    * applied to BINARY payloads by byte budget: the step that turns a
    * curated media corpus into fixed-size training shards (webdataset/
    * tfrecord-shaped output) where a sequence is a read unit and no
    * shard boundary splits a payload. Reuses
    * [[Curation.packSequences]] verbatim — the packing core is
    * payload-type-agnostic; only the cost column changes (UTF-8 bytes
    * of the staged payload, `length(payload)` on the binary column).
    *
    * Scale shape: c6's — one hash shuffle on the shard key + a
    * per-shard ordered window, both linear; byte counting is
    * scan-local; shard count grows with the cluster so the per-shard
    * sorted stream stays partition-sized. */
  def m5MediaPack(s: SparkSession, dir: String): DataFrame = {
    val t = mediaTable(s, dir)
      .select(col("doc_id"),
        length(col("payload")).cast("int").as("n_bytes"),
        (col("doc_id") % M5PackShards).cast("int").as("shard"))
    Curation.packSequences(t, "doc_id", "n_bytes", "shard", M5PackBudget)
      .select("doc_id", "shard", "n_bytes", "seq_id")
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[m1Decode]]: the stub decode is deterministic
    * arithmetic over the utf-8 payload bytes, so it IS SQL-expressible —
    * bytes recovered by hex-ing the encoded blob and folding nibble
    * pairs (the d3 oracle's strpos-on-hex trick). f_mean divides the
    * exact integer byte sum, so doubles are bit-identical across engines
    * with no rounding. */
  val oracle: Map[String, String] = Map(
    // same contiguous-fill rule as c6; the payload byte count is the
    // UTF-8 length of the staged text (octet_length over encode)
    "m5_media_pack" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         |    CAST(doc_id % $M5PackShards AS INTEGER) AS shard
         |  FROM documents),
         |cum AS (
         |  SELECT doc_id, shard, n_bytes,
         |    COALESCE(SUM(n_bytes) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cum_excl
         |  FROM b)
         |SELECT doc_id, shard, n_bytes,
         |  CAST(cum_excl // $M5PackBudget AS INTEGER) AS seq_id
         |FROM cum ORDER BY doc_id""".stripMargin,
    // every k-th fixed-size byte window, mirrored on the hex string
    // (2 hex chars per byte; substr clamps the final short frame like
    // Iterator.grouped); zero-byte docs produce zero frames via the
    // empty generate_series
    "m2_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, hx,
        |    unnest(generate_series(0, CAST((n + 31) // 32 AS BIGINT) - 1))
        |      AS i
        |  FROM b)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  substr(hx, CAST(64 * i + 1 AS BIGINT), 64) AS frame_hex
        |FROM idx WHERE i % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin,
    // stubResize byte-subsample: source byte of output position i is
    // floor(i*n/64) (0-based), i.e. hex chars [2*src+1, 2*src+2];
    // payloads already <= 64 bytes pass through unchanged
    "m3_resize_meta" ->
      """WITH b AS (
        |  SELECT doc_id, 'synthetic/' || source AS media_type,
        |    hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id, media_type,
        |  CAST(CASE WHEN n <= 64 THEN n ELSE 64 END AS INTEGER) AS n_bytes,
        |  CASE WHEN n <= 64 THEN hx
        |    ELSE array_to_string(list_transform(generate_series(0, 63),
        |      i -> substr(hx, CAST(2 * ((i * n) // 64) + 1 AS BIGINT), 2)),
        |      '')
        |    END AS payload_hex
        |FROM b ORDER BY doc_id""".stripMargin,
    "m1_multimodal_meta" ->
      """WITH b AS (
        |  SELECT doc_id, 'synthetic/' || source AS media_type,
        |    hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id, media_type, n,
        |    list_transform(generate_series(0, n - 1), i ->
        |      (strpos('0123456789ABCDEF', substr(hx, 2*i + 1, 1)) - 1) * 16 +
        |      (strpos('0123456789ABCDEF', substr(hx, 2*i + 2, 1)) - 1)) AS bl
        |  FROM b),
        |s AS (
        |  SELECT doc_id, media_type, n,
        |    CASE WHEN n > 0 THEN bl[1] ELSE 0 END AS fb,
        |    CASE WHEN n > 0 THEN list_reduce(bl, (x, y) -> x + y) ELSE 0 END
        |      AS bsum
        |  FROM bytes)
        |SELECT doc_id, media_type, CAST(n AS INTEGER) AS n_bytes,
        |  CAST(fb AS DOUBLE) AS f_first,
        |  CASE WHEN n > 0 THEN CAST(bsum AS DOUBLE) / n
        |       ELSE CAST(0 AS DOUBLE) END AS f_mean,
        |  CAST((bsum * 31 + n) % 997 AS DOUBLE) AS f_hash
        |FROM s ORDER BY doc_id""".stripMargin,
    "m4_media_dedup" -> m4Oracle,
  )

  /** m4 mirror: same fingerprints from the hex payload (gram stream =
    * byte-aligned $M4GramHex-hex-char windows via a STEP-2
    * generate_series — hex stride 2 ≡ byte stride 1, clamped at the
    * tail exactly like the kernel — then Dedup.sqlSimhashTail's shared
    * md5/±1/pack CTEs), then BRUTE-FORCE all-pairs hamming — so the
    * Spark side's banding must reproduce recall 1.0 to hash-match,
    * exactly like d7's gate entry. */
  private def m4Oracle: String =
    s"""WITH hx_t AS (
       |  SELECT doc_id, hex(encode(text)) AS hx FROM documents),
       |g_t AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, greatest(length(hx) - ${M4GramHex - 1}, 1), 2),
       |    i -> substr(hx, i, $M4GramHex))) AS t
       |  FROM hx_t),
       |${Dedup.sqlSimhashTail("g_t")}
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
       |FROM fp x JOIN fp y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 6
       |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_meta" -> m1Decode,
    "m2_frame_sample" -> m2FrameSample,
    "m3_resize_meta" -> m3ResizeMeta,
    "m4_media_dedup" -> ((s, dir) => m4MediaDedup(s, dir)),
    "m5_media_pack" -> m5MediaPack,
  )
}
