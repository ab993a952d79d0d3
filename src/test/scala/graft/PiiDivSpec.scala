package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.PiiKernels

/** Supplementary-plane `\b` pins for the t6 byte-walk kernel.
  *
  * java.util.regex's Bound decodes the ADJACENT char as a full code
  * point (`codePointBefore`/`codePointAt`) but its `hasBaseCharacter`
  * walks UTF-16 CODE UNITS — a supplementary code point is met
  * low-surrogate-first and terminates the base walk FALSE. So a
  * supplementary base letter does NOT anchor a combining mark for `\b`
  * (𐐀+mark+digits ⇒ boundary ⇒ the IP/card families MATCH), while the
  * BMP spelling (é = e+mark) anchors and suppresses the match. The
  * kernel reproduces the asymmetry exactly; each probe is asserted
  * bit-equal to the java-regex reference (the semantic definition).
  * PropertiesSpec additionally fuzzes these fragments in soup, and the
  * raw-byte soup there pins the malformed-UTF-8 fallback.
  */
class PiiDivSpec extends AnyFunSuite {
  private val suppLetter = new String(Character.toChars(0x10400)) // 𐐀
  private val suppDigit = new String(Character.toChars(0x1D7D9)) // 𝟙
  private val suppMark = new String(Character.toChars(0x101FD)) // NSM
  private val bmpMark = "́" // combining acute

  private def assertPinned(t: String): Unit = {
    val u = UTF8String.fromString(t)
    val w = PiiKernels.scrub(u)
    val r = PiiKernels.scrubRegex(u)
    (0 until 4).foreach(i => assert(w.getInt(i) == r.getInt(i),
      s"count $i on '$t': ${w.getInt(i)} vs ${r.getInt(i)}"))
    assert(w.getUTF8String(4) == r.getUTF8String(4), s"redacted on '$t'")
    assert(w.getInt(5) == r.getInt(5), s"residual on '$t'")
  }

  test("supplementary base letter does not anchor a mark for \\b " +
    "(kernel == java regex, and the IP genuinely matches)") {
    val t = suppLetter + bmpMark + "25.3.4.5"
    assertPinned(t)
    // the semantic itself: JDK's code-unit base walk hits 𐐀's low
    // surrogate -> no base -> boundary -> IP matches…
    assert(PiiKernels.scrubRegex(UTF8String.fromString(t)).getInt(2) == 1)
    // …while the BMP spelling anchors the mark and suppresses it
    val bmp = "e" + bmpMark + "25.3.4.5"
    assertPinned(bmp)
    assert(PiiKernels.scrubRegex(UTF8String.fromString(bmp)).getInt(2) == 0)
  }

  test("supplementary NSM on the left is its own low surrogate in the " +
    "JDK base walk (boundary exists even behind a base letter)") {
    val t = "a" + suppMark + "25.3.4.5"
    assertPinned(t)
    assert(PiiKernels.scrubRegex(UTF8String.fromString(t)).getInt(2) == 1)
  }

  test("remaining asymmetry probes stay bit-equal to the reference") {
    Seq(
      bmpMark + suppMark + "10.0.0.9", // mark chain ending supplementary
      suppLetter + "4111-1111-1111-1111", // supp letter before a card
      "4111111111111111" + suppMark, // trailing supp mark (right branch)
      "4111111111111111" + suppLetter, // trailing supp letter
      suppDigit + "25.3.4.5", // supplementary DIGIT (Nd) adjacent
      "25.3.4.5" + suppDigit,
      suppMark + "25.3.4.5" // mark at text start: no base either way
    ).foreach(assertPinned)
  }
}
