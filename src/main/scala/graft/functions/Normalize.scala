package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel for the t13 operator.
  *
  * Spark ships no Unicode-normalization function, and the HOF/udf
  * spellings either leave codegen or round-trip Row objects; this is
  * the standard library answer — `java.text.Normalizer` (ICU-lineage,
  * the same Unicode NFC tables DuckDB's utf8proc implements, so the
  * cross-engine gate compares bit-identical strings) behind a one-arg
  * codegen'd Expression.
  *
  * Fast path: an all-ASCII input IS its own NFC form (NFC only
  * composes sequences involving non-ASCII combining marks), so the
  * kernel answers with the INPUT UTF8String after a byte scan —
  * no String materialization, no Normalizer call. On a mostly-ASCII
  * 100 TB corpus the normalization pass is then a memcmp-speed scan
  * that allocates only for the rows that need work.
  */
object NormalizeKernels {
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) { // non-ASCII byte → really normalize
        val str = s.toString
        val out = Normalizer.normalize(str, Normalizer.Form.NFC)
        // Normalizer returns the SAME object when already normalized
        return if (out eq str) s else UTF8String.fromString(out)
      }
      i += 1
    }
    s
  }
}

/** `nfc_normalize(string) -> string` — Unicode NFC; see
  * [[NormalizeKernels]]. Named after DuckDB's builtin so the oracle
  * SQL and the Spark plan read identically. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = DataTypes.StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(a: Any): Any =
    NormalizeKernels.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
