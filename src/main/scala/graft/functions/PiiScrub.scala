package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII scrub kernel for the t6 operator.
  *
  * The composed spelling (4× `regexp_count` + a 4-step `regexp_replace`
  * fold + 1 residual `regexp_count`) evaluates nine separate regex
  * expressions per row: each `regexp_count` is `size(regexp_extract_all)`
  * (materializes every match in an array), and each fold step round-trips
  * an intermediate UTF8String. This kernel runs the SAME nine logical
  * passes — same java.util.regex engine, same pattern strings, same
  * sequential-fold semantics — in one static call: counts are bare
  * `Matcher.find()` loops (no match arrays), the fold stays on a Java
  * String between steps, and the struct comes back in one evaluation.
  *
  * Semantics pinned to the composed spelling (PiiSpec asserts
  * bit-equality on crafted strings and the corpus):
  *  - counts are per-family on the ORIGINAL text;
  *  - redaction folds families in [[PiiKernels.Families]] order, and
  *    EVERY family's replace pass runs unconditionally — an earlier
  *    family's replacement can CREATE a later family's match (replacing
  *    `a@b.co` in `a@b.co1111-2222-3333-4444` exposes the card's leading
  *    word boundary), so a skip-when-count-0 shortcut would diverge from
  *    the fold;
  *  - `residual` is one alternation scan of the redacted text.
  */
object PiiKernels {
  /** The four PII families, single source of truth (TextAnalysis
    * re-exports these for its oracle/spec mirrors). Kept to syntax with
    * identical semantics in Java regex (Spark) and RE2 (DuckDB):
    * character classes, bounded/unbounded repeats, `\b` word
    * boundaries, no backrefs or lookaround. */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhoneRe = """\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"""
  val Ipv4Re = """\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\b"""
  val CardRe = """\b[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}\b"""

  /** Redaction order (earlier tokens contain no digits, dots or `@`, so
    * later patterns cannot match INSIDE a redaction token). */
  val Families: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", PhoneRe -> "<PHONE>",
    Ipv4Re -> "<IP>", CardRe -> "<CARD>")

  /** All four families as ONE alternation for the residual re-scan
    * (non-capturing: the family regexes contain their own
    * alternations, which must not bleed precedence). */
  val AnyRe: String = Families.map { case (re, _) => s"(?:$re)" }.mkString("|")

  private val compiled: Array[(Pattern, String)] =
    Families.map { case (re, tok) => (Pattern.compile(re), tok) }.toArray
  private val anyCompiled: Pattern = Pattern.compile(AnyRe)

  val schema: StructType = StructType(Seq(
    StructField("n_emails", DataTypes.IntegerType, nullable = false),
    StructField("n_phones", DataTypes.IntegerType, nullable = false),
    StructField("n_ips", DataTypes.IntegerType, nullable = false),
    StructField("n_cards", DataTypes.IntegerType, nullable = false),
    StructField("redacted", DataTypes.StringType, nullable = false),
    StructField("residual", DataTypes.IntegerType, nullable = false)))

  private def countMatches(p: Pattern, text: String): Int = {
    val m = p.matcher(text)
    var c = 0
    while (m.find()) c += 1
    c
  }

  def scrub(s: UTF8String): InternalRow = {
    val text = s.toString
    val out = new Array[Any](6)
    var i = 0
    while (i < 4) {
      out(i) = countMatches(compiled(i)._1, text)
      i += 1
    }
    var red = text
    i = 0
    while (i < 4) {
      // tokens are literal (no '$'/'\'), so replaceAll ==
      // appendReplacement loop == Spark's RegExpReplace byte-for-byte
      red = compiled(i)._1.matcher(red).replaceAll(compiled(i)._2)
      i += 1
    }
    out(4) = UTF8String.fromString(red)
    out(5) = countMatches(anyCompiled, red)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

/** `pii_scrub(string) -> struct<n_emails:int, n_phones:int, n_ips:int,
  * n_cards:int, redacted:string, residual:int>` — see [[PiiKernels]]. */
case class PiiScrub(child: Expression) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = PiiKernels.schema
  override def prettyName: String = "pii_scrub"

  override def nullSafeEval(a: Any): Any =
    PiiKernels.scrub(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiKernels.scrub($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}
