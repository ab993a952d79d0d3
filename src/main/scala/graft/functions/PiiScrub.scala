package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DataTypes, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII scrub kernel for the t6 operator.
  *
  * Two spellings live here, pinned to each other by spec:
  *
  *  - [[PiiKernels.scrubRegex]] — the java.util.regex REFERENCE: nine
  *    logical passes (4 counts + the 4-step replace fold + 1 residual)
  *    over the same pattern strings the oracle runs in RE2. This is
  *    the semantic definition.
  *  - [[PiiKernels.scrub]] — the PRODUCT byte-walk: the four families
  *    are hand-compiled to byte matchers (each a handful of table
  *    lookups per candidate position, no NFA), so every pass is a
  *    linear walk that skips letter bytes at one comparison each. A
  *    one-pass prescan closes the common case outright: EmailRe
  *    requires '@' and the three digit families require an ASCII
  *    digit, so text with neither is returned untouched after a
  *    single walk. All pattern CLASS bytes are ASCII and UTF-8
  *    multi-byte sequences contain no bytes < 0x80, so raw-byte class
  *    matching is character-exact. `\b` is the one Unicode-aware
  *    construct: java's Pattern.Bound tests `'_' ||
  *    Character.isLetterOrDigit(cp)` (plus a non-spacing mark
  *    counting as word when it trails a base letter/digit) even
  *    WITHOUT UNICODE_CHARACTER_CLASS — so a CJK letter after a digit
  *    run suppresses the boundary. The walk reproduces this exactly,
  *    decoding the adjacent code point only when a boundary check
  *    meets a byte >= 0x80 (the fuzz spec plants CJK and combining
  *    marks against digit runs to pin it).
  *
  * Semantics pinned to the composed regex spelling (PiiSpec asserts
  * bit-equality on crafted strings and the corpus; PropertiesSpec
  * fuzzes scrub ≡ scrubRegex on adversarial random strings):
  *  - counts are per-family on the ORIGINAL text (java `find()`
  *    semantics: leftmost start, greedy-with-backtracking, matches
  *    non-overlapping per family);
  *  - redaction folds families in [[PiiKernels.Families]] order; once
  *    any replacement has happened, EVERY later family's pass runs on
  *    the current text — an earlier family's replacement can CREATE a
  *    later family's match (replacing `a@b.co` in
  *    `a@b.co1111-2222-3333-4444` exposes the card's leading word
  *    boundary). Before the first replacement the fold text IS the
  *    original, so a zero-count family's pass is provably identity
  *    and is skipped;
  *  - `residual` is one alternation scan of the redacted text
  *    (email|phone|ip|card tried in that order at each position).
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

  /** The java.util.regex reference spelling — same engine as Spark's
    * regexp functions, nine passes fused into one call. Spec-pinned
    * against both the composed `functions._` spelling and the product
    * byte-walk [[scrub]]; not on the product path. */
  def scrubRegex(s: UTF8String): InternalRow = {
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
    new GenericInternalRow(out)
  }

  // ------------------------------------------------ byte-walk kernel

  // ASCII class tables; bytes >= 0x80 (negative) are in no PATTERN
  // class, matching java regex (non-ASCII chars are outside every
  // class here). `\b` is different — see wordAt/wordBefore below.
  private val TL = new Array[Boolean](128) // email local [A-Za-z0-9._%+-]
  private val TD = new Array[Boolean](128) // domain [A-Za-z0-9.-]
  private val TW = new Array[Boolean](128) // word chars for \b
  locally {
    var c = 'A'.toInt
    while (c <= 'Z') { TL(c) = true; TD(c) = true; TW(c) = true; c += 1 }
    c = 'a'.toInt
    while (c <= 'z') { TL(c) = true; TD(c) = true; TW(c) = true; c += 1 }
    c = '0'.toInt
    while (c <= '9') { TL(c) = true; TD(c) = true; TW(c) = true; c += 1 }
    "._%+-".foreach(ch => TL(ch.toInt) = true)
    TD('.'.toInt) = true; TD('-'.toInt) = true
    TW('_'.toInt) = true
  }
  @inline private def isL(b: Byte): Boolean = b >= 0 && TL(b)
  @inline private def isDm(b: Byte): Boolean = b >= 0 && TD(b)
  @inline private def dig(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  // ---- `\b` exactly as java Pattern.Bound evaluates it ----

  @inline private def wordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** Decode the UTF-8 code point starting at `s` (0xFFFD on a
    * truncated/malformed tail — non-letter either way). */
  private def decodeAt(a: Array[Byte], n: Int, s: Int): Int = {
    val b0 = a(s) & 0xFF
    if (b0 < 0x80) b0
    else if (b0 < 0xC0) 0xFFFD
    else if (b0 < 0xE0) {
      if (s + 1 >= n) 0xFFFD
      else ((b0 & 0x1F) << 6) | (a(s + 1) & 0x3F)
    } else if (b0 < 0xF0) {
      if (s + 2 >= n) 0xFFFD
      else ((b0 & 0x0F) << 12) | ((a(s + 1) & 0x3F) << 6) | (a(s + 2) & 0x3F)
    } else {
      if (s + 3 >= n) 0xFFFD
      else ((b0 & 0x07) << 18) | ((a(s + 1) & 0x3F) << 12) |
        ((a(s + 2) & 0x3F) << 6) | (a(s + 3) & 0x3F)
    }
  }

  /** Start index of the char whose last byte is `e - 1`. */
  @inline private def charStartBefore(a: Array[Byte], e: Int): Int = {
    var s = e - 1
    while (s > 0 && (a(s) & 0xC0) == 0x80) s -= 1
    s
  }

  /** java Pattern.hasBaseCharacter: walk backward from position `p`,
    * skipping NON_SPACING_MARKs, true iff a letter/digit comes first.
    * CRITICAL: the JDK walks UTF-16 CODE UNITS (`seq.charAt(x)`), so a
    * supplementary code point is met LOW-SURROGATE-FIRST — a surrogate
    * is neither letter/digit nor NON_SPACING_MARK, and the walk stops
    * with false. A supplementary base letter (𐐀) therefore does NOT
    * anchor a mark for `\b`, even though the full code point is a
    * letter. 4-byte UTF-8 sequences map exactly to supplementary code
    * points, so the byte-walk mirrors this by failing on any 4-byte
    * lead byte. */
  private def hasBase(a: Array[Byte], p: Int): Boolean = {
    var e = p
    while (e > 0) {
      val s = charStartBefore(a, e)
      if ((a(s) & 0xFF) >= 0xF0) return false // supplementary: JDK sees
      val cp = decodeAt(a, a.length, s) //        its low surrogate first
      if (Character.isLetterOrDigit(cp)) return true
      if (Character.getType(cp) != Character.NON_SPACING_MARK) return false
      e = s
    }
    false
  }

  /** Bound's word test for the char STARTING at `p` (false past the
    * end): ASCII stays in the table; otherwise decode, and a
    * non-spacing mark counts as word iff it has a base letter/digit
    * behind it. */
  private def wordAt(a: Array[Byte], n: Int, p: Int): Boolean = {
    if (p >= n) return false
    val b = a(p)
    if (b >= 0) return TW(b)
    val cp = decodeAt(a, n, p)
    if (wordCp(cp)) true
    else if (Character.getType(cp) == Character.NON_SPACING_MARK)
      hasBase(a, p)
    else false
  }

  /** Bound's word test for the char ENDING at `i - 1` (false at the
    * start of the text). Left-branch asymmetry vs [[wordAt]]: the JDK's
    * base walk for a LEFT mark starts at the mark's own last code unit
    * (`hasBaseCharacter(matcher, i-1, seq)` with the mark ending at
    * i-1) — a BMP mark skips itself as NSM, but a SUPPLEMENTARY mark is
    * its own low surrogate there, so it never has a base. */
  private def wordBefore(a: Array[Byte], i: Int): Boolean = {
    if (i <= 0) return false
    val b = a(i - 1)
    if (b >= 0) return TW(b)
    val s = charStartBefore(a, i)
    val cp = decodeAt(a, a.length, s)
    if (wordCp(cp)) true
    else if (Character.getType(cp) == Character.NON_SPACING_MARK)
      (a(s) & 0xFF) < 0xF0 && hasBase(a, s)
    else false
  }

  private val Tokens: Array[Array[Byte]] =
    Families.map(_._2.getBytes("UTF-8")).toArray

  /** Growable flat (start, end) span list — allocated per call, never
    * shared (expression eval is concurrent across tasks). */
  private final class Spans {
    var a = new Array[Int](8)
    var n = 0
    def add(s: Int, e: Int): Unit = {
      if (n + 2 > a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = s; a(n + 1) = e; n += 2
    }
    def count: Int = n / 2
  }

  /** Email domain match after the '@' at `at`: greedy [A-Za-z0-9.-]+
    * then the LAST '.' (backtracking order: longest domain-part first)
    * followed by >= 2 letters, letters taken greedily. Returns the
    * match end, or -1. The domain part before the dot must be
    * non-empty (j >= at+2 == the `+`). */
  private def emailDomainEnd(a: Array[Byte], n: Int, at: Int): Int = {
    var de = at + 1
    while (de < n && isDm(a(de))) de += 1
    if (de == at + 1) return -1
    var j = de - 1
    while (j >= at + 2) {
      if (a(j) == '.' && j + 2 < n && isAlpha(a(j + 1)) && isAlpha(a(j + 2))) {
        var m = j + 3
        while (m < n && isAlpha(a(m))) m += 1
        return m
      }
      j -= 1
    }
    -1
  }

  /** All email matches, find() semantics. A match's local part is a
    * [A-Za-z0-9._%+-]+ run ending exactly at an '@' ('@' is not in the
    * class, so the greedy `+` has a single viable split); the leftmost
    * start is the run start (clamped past the previous match end by
    * the scan itself). A run not ending at '@', or an '@' whose domain
    * fails, eliminates every start inside the run — jump past it. */
  private def emailSpans(a: Array[Byte], n: Int, out: Spans): Unit = {
    var i = 0
    while (i < n) {
      if (isL(a(i))) {
        var e = i
        while (e < n && isL(a(e))) e += 1
        if (e < n && a(e) == '@') {
          val end = emailDomainEnd(a, n, e)
          if (end >= 0) { out.add(i, end); i = end } else i = e + 1
        } else i = e + 1
      } else i += 1
    }
  }

  /** Phone attempt at exactly `i`: optional '+', a digit run of
    * exactly 1-3 (a longer run leaves a digit where '-' must be — no
    * viable backtrack), '-', exactly 3 digits, '-', >= 4 digits taking
    * 4 (no trailing anchor). Returns match end or -1. */
  private def phoneAt(a: Array[Byte], n: Int, i: Int): Int = {
    var p = i
    if (p < n && a(p) == '+') p += 1
    val d0 = p
    while (p < n && p - d0 < 4 && dig(a(p))) p += 1
    val m = p - d0
    if (m < 1 || m > 3) return -1
    if (p >= n || a(p) != '-') return -1
    p += 1
    if (p + 3 >= n || !dig(a(p)) || !dig(a(p + 1)) || !dig(a(p + 2)) ||
      a(p + 3) != '-') return -1
    p += 4
    if (p + 3 >= n || !dig(a(p)) || !dig(a(p + 1)) || !dig(a(p + 2)) ||
      !dig(a(p + 3))) return -1
    p + 4
  }

  @inline private def dig4(a: Array[Byte], n: Int, p: Int): Boolean =
    p + 3 < n && dig(a(p)) && dig(a(p + 1)) && dig(a(p + 2)) && dig(a(p + 3))

  /** Card attempt at `i` (caller checked the leading \b and digit):
    * 4 digits, then 3 × (optional [- ] separator, 4 digits), then \b.
    * The separator's greedy/empty backtrack collapses: if a separator
    * byte is present but 4 digits don't follow it, the empty
    * alternative needs a digit AT the separator — impossible. */
  private def cardAt(a: Array[Byte], n: Int, i: Int): Int = {
    if (!dig4(a, n, i)) return -1
    var p = i + 4
    var g = 0
    while (g < 3) {
      if (p < n && (a(p) == '-' || a(p) == ' ') && dig4(a, n, p + 1)) p += 5
      else if (dig4(a, n, p)) p += 4
      else return -1
      g += 1
    }
    if (wordAt(a, n, p)) -1 else p
  }

  /** Octet alternation candidates at `p` as a bitmask (bit 2 = length
    * 3, bit 1 = length 2, bit 0 = length 1), in the pattern's
    * preference order 25[0-5] | 2[0-4]\d | 1\d\d | [1-9]?\d — the
    * three 3-length alternatives are mutually exclusive, and
    * [1-9]?\d prefers 2 chars over 1. */
  @inline private def octCands(a: Array[Byte], n: Int, p: Int): Int = {
    if (p >= n || !dig(a(p))) return 0
    var m = 1
    if (p + 1 < n && a(p) >= '1' && dig(a(p + 1))) m |= 2
    if (p + 2 < n && dig(a(p + 2))) {
      val c0 = a(p); val c1 = a(p + 1)
      if ((c0 == '2' && c1 == '5' && a(p + 2) <= '5') ||
        (c0 == '2' && c1 >= '0' && c1 <= '4') ||
        (c0 == '1' && dig(c1))) m |= 4
    }
    m
  }

  /** `(\.(octet)){rem}` then the trailing \b, with the regex's
    * backtracking order (later octets re-choose first; within an
    * octet, longer alternatives first). Depth <= 3, <= 27 paths. */
  private def ipFrom(a: Array[Byte], n: Int, p: Int, rem: Int): Int = {
    if (rem == 0) return if (!wordAt(a, n, p)) p else -1
    if (p >= n || a(p) != '.') return -1
    val m = octCands(a, n, p + 1)
    var l = 3
    while (l >= 1) {
      if (((m >> (l - 1)) & 1) != 0) {
        val r = ipFrom(a, n, p + 1 + l, rem - 1)
        if (r >= 0) return r
      }
      l -= 1
    }
    -1
  }

  /** IPv4 attempt at `i` (caller checked the leading \b and digit). */
  private def ipAt(a: Array[Byte], n: Int, i: Int): Int = {
    val m = octCands(a, n, i)
    var l = 3
    while (l >= 1) {
      if (((m >> (l - 1)) & 1) != 0) {
        val r = ipFrom(a, n, i + l, 3)
        if (r >= 0) return r
      }
      l -= 1
    }
    -1
  }

  /** All matches of a digit family (1 = phone, 2 = ip, 3 = card),
    * find() semantics: candidate starts are '+'/digit bytes (phone) or
    * \b-preceded digit bytes (ip/card); everything else is skipped at
    * one class lookup per byte. */
  private def scanSpans(fam: Int, a: Array[Byte], n: Int, out: Spans): Unit = {
    var i = 0
    while (i < n) {
      val b = a(i)
      var end = -1
      if (fam == 1) {
        if (b == '+' || dig(b)) end = phoneAt(a, n, i)
      } else if (dig(b) && !wordBefore(a, i)) {
        end = if (fam == 2) ipAt(a, n, i) else cardAt(a, n, i)
      }
      if (end >= 0) { out.add(i, end); i = end } else i += 1
    }
  }

  /** replaceAll: splice `tok` over each span. */
  private def splice(a: Array[Byte], n: Int, sp: Spans,
      tok: Array[Byte]): Array[Byte] = {
    var removed = 0
    var k = 0
    while (k < sp.n) { removed += sp.a(k + 1) - sp.a(k); k += 2 }
    val out = new Array[Byte](n - removed + sp.count * tok.length)
    var src = 0; var dst = 0
    k = 0
    while (k < sp.n) {
      val st = sp.a(k); val en = sp.a(k + 1)
      System.arraycopy(a, src, out, dst, st - src); dst += st - src
      System.arraycopy(tok, 0, out, dst, tok.length); dst += tok.length
      src = en; k += 2
    }
    System.arraycopy(a, src, out, dst, n - src)
    out
  }

  /** The residual alternation scan: at each position try email, phone,
    * ip, card in pattern order; first match wins, continue past it.
    * The email attempt is memoized per [A-Za-z0-9._%+-]+ run: a run
    * not ending at a domain-valid '@' fails email at every position
    * inside it, while phone/ip/card (whose alphabets are subsets of
    * the run class) are still tried per position. */
  private def anyCount(a: Array[Byte], n: Int): Int = {
    var i = 0
    var cnt = 0
    var runEnd = -1
    var runEmailEnd = -1
    while (i < n) {
      val b = a(i)
      var matched = -1
      if (isL(b)) {
        if (i >= runEnd) {
          var e = i
          while (e < n && isL(a(e))) e += 1
          runEnd = e
          runEmailEnd =
            if (e < n && a(e) == '@') emailDomainEnd(a, n, e) else -1
        }
        if (runEmailEnd >= 0) matched = runEmailEnd
      }
      if (matched < 0 && (b == '+' || dig(b))) matched = phoneAt(a, n, i)
      if (matched < 0 && dig(b) && !wordBefore(a, i)) {
        matched = ipAt(a, n, i)
        if (matched < 0) matched = cardAt(a, n, i)
      }
      if (matched >= 0) { cnt += 1; i = matched } else i += 1
    }
    cnt
  }

  /** The product kernel (see object scaladoc). Bit-equal to
    * [[scrubRegex]] / the composed regexp spelling — INCLUDING on
    * malformed UTF-8: the byte-walk assumes valid UTF-8 (it returns
    * original bytes when unchanged, while String round-trips normalize
    * bad sequences to U+FFFD and can shift `\b`/class positions), so
    * the prescan validates and falls back to [[scrubRegex]] — which IS
    * the String round-trip Spark's own regexp functions take — on any
    * invalid sequence. */
  def scrub(s: UTF8String): InternalRow = {
    val a = s.getBytes
    val n = a.length
    // prescan, one walk: (1) email needs '@', phone/ip/card need an
    // ASCII digit — text with neither is untouched (all counts 0 =>
    // the fold is identity => residual 0); (2) UTF-8 validity
    // (length, continuation bytes, overlong/surrogate/out-of-range
    // second-byte fences) — invalid => scrubRegex fallback
    var hasAt = false; var hasDig = false
    var i = 0
    while (i < n) {
      val b = a(i)
      if (b >= 0) {
        if (b == '@') hasAt = true else if (dig(b)) hasDig = true
        i += 1
      } else {
        val b0 = b & 0xFF
        val len =
          if (b0 >= 0xC2 && b0 <= 0xDF) 2
          else if (b0 >= 0xE0 && b0 <= 0xEF) 3
          else if (b0 >= 0xF0 && b0 <= 0xF4) 4
          else -1 // 0x80..0xC1 (stray continuation / overlong 2-byte)
        if (len < 0 || i + len > n) return scrubRegex(s)
        val b1 = a(i + 1) & 0xFF
        val b1ok = b0 match {
          case 0xE0 => b1 >= 0xA0 && b1 <= 0xBF // 3-byte overlong fence
          case 0xED => b1 >= 0x80 && b1 <= 0x9F // UTF-16 surrogate fence
          case 0xF0 => b1 >= 0x90 && b1 <= 0xBF // 4-byte overlong fence
          case 0xF4 => b1 >= 0x80 && b1 <= 0x8F // > U+10FFFF fence
          case _ => b1 >= 0x80 && b1 <= 0xBF
        }
        if (!b1ok) return scrubRegex(s)
        var j = i + 2
        while (j < i + len) {
          if ((a(j) & 0xC0) != 0x80) return scrubRegex(s)
          j += 1
        }
        i += len
      }
    }
    val out = new Array[Any](6)
    if (!hasAt && !hasDig) {
      out(0) = 0; out(1) = 0; out(2) = 0; out(3) = 0
      out(4) = s; out(5) = 0
      return new GenericInternalRow(out)
    }
    val spans = Array(new Spans, new Spans, new Spans, new Spans)
    if (hasAt) emailSpans(a, n, spans(0))
    if (hasDig) {
      scanSpans(1, a, n, spans(1))
      scanSpans(2, a, n, spans(2))
      scanSpans(3, a, n, spans(3))
    }
    var red = a; var rn = n
    var changed = false
    var k = 0
    while (k < 4) {
      if (changed) {
        // text differs from the original: the family must be re-scanned
        // (an earlier replacement can create or destroy its matches)
        val sp = new Spans
        if (k == 0) emailSpans(red, rn, sp) else scanSpans(k, red, rn, sp)
        if (sp.n > 0) { red = splice(red, rn, sp, Tokens(k)); rn = red.length }
      } else if (spans(k).n > 0) {
        red = splice(red, rn, spans(k), Tokens(k)); rn = red.length
        changed = true
      }
      k += 1
    }
    out(0) = spans(0).count
    out(1) = spans(1).count
    out(2) = spans(2).count
    out(3) = spans(3).count
    out(4) = if (changed) UTF8String.fromBytes(red) else s
    out(5) = if (changed) anyCount(red, rn) else 0
    new GenericInternalRow(out)
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
