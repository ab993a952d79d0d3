package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** t17's trained scoring artifact: the FULL B×B grid of per-bigram
  * log-probabilities in integer micro-nats, so executors score with one
  * array load per bigram — no ln, no rounding, no hash probe, no join.
  * 4 MB at B = 1024 (Int cells), broadcast once per executor.
  *
  * [[CcnetLpGrid.lpMicro]] reproduces the SQL spelling
  * `CAST(floor(round(ln((c+1)/(cu+B)),6)*1e6+0.5) AS BIGINT)` exactly:
  * `Math.log` is the same libm call Spark's `ln` evaluates, and the
  * 6-decimal HALF_UP rounding matches Spark's `round` on doubles
  * (BigDecimal.valueOf semantics). TextAnalysisSpec pins the kernel
  * path bit-identical to the composed join spelling over the whole
  * gate corpus, and the DuckDB gate re-proves it cross-engine. */
final class CcnetLpGrid(val lp: Array[Int]) extends Serializable

object CcnetLpGrid {
  /** The t17 per-bigram log-probability in integer micro-nats —
    * driver-side twin of `TextAnalysis.t17LpMicroSql`. */
  def lpMicro(c: Long, cu: Long, b: Int): Long = {
    val x = math.log((c + 1.0) / (cu + b.toDouble))
    val r = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    math.floor(r * 1000000.0 + 0.5).toLong
  }

  /** Build the full grid from the OBSERVED pair counts (key = pb·B+cb).
    * Unobserved cells get the add-1-smoothed lp of c = 0 under their
    * row's unigram total — scoring the training corpus never reads
    * them (every scored bigram was counted), but the grid stays total
    * so the kernel needs no sentinel branch. ≤ B² ln calls, once per
    * corpus generation. */
  def build(pairs: Array[(Long, Long)], b: Int): CcnetLpGrid = {
    val cu = new Array[Long](b)
    pairs.foreach { case (k, c) => cu((k / b).toInt) += c }
    val grid = new Array[Int](b * b)
    var pb = 0
    while (pb < b) {
      val l0 = lpMicro(0L, cu(pb), b).toInt
      java.util.Arrays.fill(grid, pb * b, (pb + 1) * b, l0)
      pb += 1
    }
    pairs.foreach { case (k, c) =>
      grid(k.toInt) = lpMicro(c, cu((k / b).toInt), b).toInt
    }
    new CcnetLpGrid(grid)
  }
}

/** Per-row kernels for the t17 CCNet-perplexity path. */
object CcnetKernels {
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** A token's model bucket: integer value of the first 3 hex nibbles
    * of md5(token) mod `b` — `TextAnalysis.t17Bucket` without the hex
    * string round-trip. */
  @inline private def bucket(md: MessageDigest, bytes: Array[Byte],
      from: Int, len: Int, b: Int): Int = {
    md.update(bytes, from, len)
    val d = md.digest()
    (((d(0) & 0xff) << 4) | ((d(1) >> 4) & 0xf)) % b
  }

  /** One pass over the raw text: tokenize on single spaces (the
    * `filter(split(text, ' '), x -> x <> '')` contract — 0x20 never
    * occurs inside a UTF-8 multibyte sequence, so the byte walk is
    * exact), md5-bucket each token, and emit one long key pb·b+cb per
    * adjacent pair. ONE digest per token, versus two per bigram in the
    * exploded struct spelling. Empty/1-token docs yield an empty array
    * (the caller filters them, mirroring the join spelling's
    * `size(toks) >= 2`). */
  def bigramKeys(s: UTF8String, b: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // pass 1: token count = exact key-array size
    var nTok = 0
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) { nTok += 1; while (i < n && bytes(i) != ' ') i += 1 }
    }
    if (nTok < 2) return new GenericArrayData(new Array[Long](0))
    val keys = new Array[Long](nTok - 1)
    val md = md5Local.get()
    var prev = -1
    var k = 0
    i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && bytes(i) != ' ') i += 1
        val cur = bucket(md, bytes, start, i - start, b)
        if (prev >= 0) { keys(k) = prev.toLong * b + cur; k += 1 }
        prev = cur
      }
    }
    new GenericArrayData(keys)
  }

  /** Score one doc: Σ lp over its bigram keys (one array load each),
    * then the integer mean in the house div semantics — all lp are
    * ≤ 0, so −Σ ≥ 0 and Java's truncating `/` equals SQL `div`. */
  def nll(keys: ArrayData, grid: CcnetLpGrid): InternalRow = {
    val n = keys.numElements()
    val lp = grid.lp
    var sum = 0L
    var i = 0
    while (i < n) { sum += lp(keys.getLong(i).toInt); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, (-sum) / n))
  }
}

/** `t17_bigram_keys(string)` — registered SQL-callable kernel (no
  * driver artifact rides in it). */
case class T17BigramKeys(child: Expression, buckets: Int)
    extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(DataTypes.LongType, containsNull = false)
  override def prettyName: String = "t17_bigram_keys"

  override def nullSafeEval(a: Any): Any =
    CcnetKernels.bigramKeys(a.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CcnetKernels.bigramKeys($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): T17BigramKeys =
    copy(child = newChild)
}

/** `t17_nll(array<long>)`-shaped expression holding t17's broadcast lp
  * grid — constructed programmatically via
  * `org.apache.spark.sql.graftbridge.GraftColumns` like
  * [[RareBigramStats]] (a driver artifact cannot ride through SQL
  * text). The Broadcast handle serializes into tasks, so the 4 MB grid
  * ships once per executor; codegen resolves `.value()` once per task
  * into generated mutable state, not per row. */
case class T17Nll(child: Expression,
    model: org.apache.spark.broadcast.Broadcast[CcnetLpGrid])
    extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "n_bigrams", DataTypes.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "nll_micro", DataTypes.LongType, nullable = false)))
  override def prettyName: String = "t17_nll"

  override def nullSafeEval(a: Any): Any =
    CcnetKernels.nll(a.asInstanceOf[ArrayData], model.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("t17GridBc", model,
      "org.apache.spark.broadcast.Broadcast")
    val resolved = ctx.addMutableState("graft.functions.CcnetLpGrid",
      "t17Grid", v => s"$v = (graft.functions.CcnetLpGrid)$ref.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CcnetKernels.nll($c, $resolved)")
  }

  override protected def withNewChildInternal(newChild: Expression): T17Nll =
    copy(child = newChild)
}
