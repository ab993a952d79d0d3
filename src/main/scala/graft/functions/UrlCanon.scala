package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization kernel for the t14/d13 operators — the first
  * normalization any web-crawl pipeline applies before URL-level
  * dedup (RefinedWeb/C4-style): the same page arrives under dozens of
  * spellings (case-shifted scheme/host, default ports, tracking
  * params in arbitrary order, fragments) and must collapse to ONE
  * key before any content is fetched or compared.
  *
  * Canonical form, given an absolute `scheme://...` URL:
  *   - scheme and host lowercased (path/query case is significant and
  *     kept);
  *   - default port stripped (`:443` under https, `:80` under http);
  *     any other explicit port kept;
  *   - trailing slashes stripped from the path; an empty path becomes
  *     `/`;
  *   - the query split on `&`; empty params and tracking params
  *     (prefixes `utm_`, `ref=`, `fbclid=`, `gclid=`) dropped; the
  *     survivors sorted in UTF-8 byte order and rejoined;
  *   - the fragment dropped.
  * Inputs with no `scheme://` prefix pass through UNCHANGED (the
  * operator contract covers absolute URLs; a non-URL is someone
  * else's problem, not silently mangled).
  *
  * The kernel is the codegen'd hot path; its semantics are DEFINED by
  * the composed regexp/HOF spelling in
  * [[graft.operators.TextAnalysis.t14CanonSql]] (one dialect string
  * feeding Spark `expr` and the DuckDB oracle), and
  * TextAnalysisSpec pins kernel ≡ composed spelling bit-exactly on
  * the gate corpus plus an adversarial planted set (no scheme, bare
  * host, dangling colon, tracking-only query, multi-slash tails,
  * non-default ports). Param ordering compares UTF8String bytes —
  * Spark `array_sort`'s binary order, NOT java.lang.String UTF-16
  * order (they diverge beyond the BMP).
  */
object UrlCanonKernels {
  private val TrackingPrefixes = Array("utm_", "ref=", "fbclid=", "gclid=")

  def canon(u: UTF8String): UTF8String = {
    val s = u.toString
    // scheme: longest [A-Za-z][A-Za-z0-9+.-]* prefix followed by "://"
    // ("://" contains non-scheme chars, so the first occurrence is the
    // only regex candidate)
    val si = s.indexOf("://")
    def schemeStart(c: Char) = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
    def schemeChar(c: Char) = schemeStart(c) || (c >= '0' && c <= '9') ||
      c == '+' || c == '.' || c == '-'
    var ok = si > 0 && schemeStart(s.charAt(0))
    var i = 1
    while (ok && i < si) { ok = schemeChar(s.charAt(i)); i += 1 }
    if (!ok) return u
    val scheme = s.substring(0, si).toLowerCase
    val rest = s.substring(si + 3)
    // hostport: up to the first of / ? #
    var he = 0
    while (he < rest.length && rest.charAt(he) != '/' &&
      rest.charAt(he) != '?' && rest.charAt(he) != '#') he += 1
    val hostport = rest.substring(0, he)
    val tail = rest.substring(he)
    // host: up to the FIRST ':' — lowercased via UTF8String to match
    // Spark's lower() exactly on non-ASCII hosts
    val ci = hostport.indexOf(':')
    val host = UTF8String
      .fromString(if (ci < 0) hostport else hostport.substring(0, ci))
      .toLowerCase.toString
    // port: ':' + a nonempty all-digit run at the END of hostport
    var pi = hostport.length
    while (pi > 0 && { val c = hostport.charAt(pi - 1); c >= '0' && c <= '9' })
      pi -= 1
    val port =
      if (pi > 0 && pi < hostport.length && hostport.charAt(pi - 1) == ':')
        hostport.substring(pi)
      else ""
    val portPart =
      if (port.isEmpty || (scheme == "https" && port == "443") ||
        (scheme == "http" && port == "80")) "" else ":" + port
    // path: up to the first of ? # ; then strip ALL trailing slashes
    var pe = 0
    while (pe < tail.length && tail.charAt(pe) != '?' &&
      tail.charAt(pe) != '#') pe += 1
    var pathEnd = pe
    while (pathEnd > 0 && tail.charAt(pathEnd - 1) == '/') pathEnd -= 1
    val cpath = if (pathEnd == 0) "/" else tail.substring(0, pathEnd)
    // query: only if the char after the path is '?'; up to '#'
    val query = if (pe < tail.length && tail.charAt(pe) == '?') {
      val qs = pe + 1
      var qe = qs
      while (qe < tail.length && tail.charAt(qe) != '#') qe += 1
      tail.substring(qs, qe)
    } else ""
    val kept = query.split("&", -1).filter { p =>
      p.nonEmpty && !TrackingPrefixes.exists(p.startsWith)
    }.map(UTF8String.fromString)
    java.util.Arrays.sort(kept, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val params = kept.map(_.toString).mkString("&")
    val out = new java.lang.StringBuilder(s.length)
    out.append(scheme).append("://").append(host).append(portPart)
      .append(cpath)
    if (params.nonEmpty) out.append('?').append(params)
    UTF8String.fromString(out.toString)
  }
}

/** `url_canon(string) -> string` — crawl-grade URL canonicalization;
  * see [[UrlCanonKernels]]. */
case class UrlCanon(child: Expression) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = DataTypes.StringType
  override def prettyName: String = "url_canon"

  override def nullSafeEval(a: Any): Any =
    UrlCanonKernels.canon(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanonKernels.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanon =
    copy(child = newChild)
}
