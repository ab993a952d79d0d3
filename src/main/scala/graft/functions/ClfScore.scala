package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DataTypes}

/** Per-row kernel for the t15 classifier SCORE walk. */
object ClfKernels {
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Score one doc: prior + Σ_token w[bucket(token)] where bucket =
    * integer value of md5's first 4 hex nibbles (= first 2 bytes) mod
    * `m` — `TextAnalysis.bucketMod` without the hex-string round trip
    * (the CcnetKernels.bucket discipline, 16 bits instead of 12). `w`
    * is the trained weight map DENSIFIED over all m buckets with 0 for
    * unobserved ones, so the array load reproduces
    * `coalesce(element_at(weight_map, bucket), 0)` exactly; all-Long
    * arithmetic, so the sum is bit-identical to the HOF spelling
    * whatever the evaluation order. A null token contributes 0 (the
    * HOF's md5(NULL) → NULL → coalesce path). */
  def score(toks: ArrayData, w: Array[Long], m: Int, prior: Long): Long = {
    val md = md5Local.get()
    var sum = prior
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val b = toks.getUTF8String(i).getBytes
        md.update(b, 0, b.length)
        val d = md.digest()
        sum += w((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % m)
      }
      i += 1
    }
    sum
  }
}

/** `clf_score(array<string>)`-shaped expression carrying the trained
  * dense weight array + prior — constructed programmatically via
  * `org.apache.spark.sql.graftbridge.GraftColumns` (the T17Nll
  * pattern; the artifact is 128 Longs, so it rides the expression
  * directly, no broadcast needed). Replaces the interpreted
  * `aggregate(toks, …)` HOF walk on the scoring paths (t15_clf_scores
  * and the c30 composed DAG): one codegen'd call per row, one md5 per
  * token, no per-token Catalyst eval. ClassifierSpec pins it
  * bit-identical to the HOF spelling corpus-wide, and the unchanged
  * DuckDB oracles re-prove it cross-engine at the gate. */
case class ClfScore(child: Expression, weights: Array[Long],
    buckets: Int, priorMicro: Long) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = DataTypes.LongType
  override def prettyName: String = "clf_score"

  override def nullSafeEval(a: Any): Any =
    ClfKernels.score(a.asInstanceOf[ArrayData], weights, buckets, priorMicro)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("clfWeights", weights, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ClfKernels.score($c, $ref, $buckets, ${priorMicro}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): ClfScore =
    copy(child = newChild)
}
