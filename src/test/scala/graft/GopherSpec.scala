package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextKernels

/** Gopher-rule counters against hand-computed cases: every counter,
  * the threshold arithmetic, and the ASCII-contract edges (unicode
  * spaces don't split, astral chars count once). */
class GopherSpec extends AnyFunSuite {

  private def g(t: String): Seq[Long] = {
    val r = TextKernels.gopherStats(UTF8String.fromString(t))
    (0 until 8).map(i => r.getLong(i)) :+ r.getInt(8).toLong
  }

  test("every counter on a hand-computed document") {
    val t = "The cat and the dog\n" + // 5 words; stops the,and,the
      "• bullet item\n" +        // bullet line; 3 words
      "  - dashed\n" +                // bullet after ltrim; 2 words
      "trailing off...\n" +           // ellipsis-ended; 2 words
      "# tag … and #2"           // 5 words; stops: and; syms #,…,#
    val Seq(nW, cps, sym, nL, nB, nE, nA, nS, pass) = g(t)
    assert(nW == 17)  // 5+3+2+2+5
    assert(cps == 57) // 15+11+7+14+10
    assert(sym == 4)  // '#' ×2, '…' ×1, "..." ×1
    assert(nL == 5)
    assert(nB == 2)   // '•' and '-' lines ('#' is not a bullet char)
    assert(nE == 1)   // the "..." line ('…' mid-line does not end one)
    assert(nA == 12)  // words with an ASCII letter: 5+2+1+2+2
    assert(nS == 4)   // the, and, the, and
    assert(pass == 0) // fails the 50-word floor
  }

  test("symbol counting: '#', '…', non-overlapping '...'") {
    assert(g("a # b")(2) == 1)
    assert(g("a … b")(2) == 1)
    assert(g("a ... b")(2) == 1)
    assert(g("....")(2) == 1) // one non-overlapping triple
    assert(g("......")(2) == 2)
    assert(g(".. .")(2) == 0)
    assert(g("#…...")(2) == 3)
  }

  test("line counting: split on newline keeps empties; trims are ASCII") {
    assert(g("a\n\nb")(3) == 3)
    assert(g("")(3) == 1)
    assert(g("\t • x")(4) == 1)  // bullet after space-tab ltrim
    assert(g("x ...  \t")(5) == 1)    // ellipsis after rtrim
    assert(g("\u00a0\u2022 x")(4) == 0) // NBSP not trimmed (ASCII contract)
  }

  test("word contract: ASCII whitespace splits, unicode spaces do not") {
    assert(g("a\u00a0b c")(0) == 2)   // NBSP glues a and b
    assert(g("a\u000bb")(0) == 2)     // VT splits (Java \s contract)
    assert(g("😀 ab")(1) == 3) // astral emoji = 1 cp, ab = 2
  }

  test("sentence segmentation: boundaries, runs, trims, empties") {
    def sents(t: String): Seq[String] = {
      val a = TextKernels.sentences(UTF8String.fromString(t))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    assert(sents("A one. B two!? middle text ... C three? D") ===
      Seq("A one.", "B two!?", "middle text ...", "C three?", "D"))
    // punct at end of text closes the last sentence (no ws needed)
    assert(sents("ends here...") === Seq("ends here..."))
    assert(sents("a. b. ") === Seq("a.", "b."))
    // punct NOT followed by ws is not a boundary (decimals, urls)
    assert(sents("pi is 3.14 ok? yes") === Seq("pi is 3.14 ok?", "yes"))
    // leading/trailing ws trims; empty and all-ws inputs yield nothing
    assert(sents("  x  ") === Seq("x"))
    assert(sents("") === Seq.empty)
    assert(sents(" \t\n") === Seq.empty)
    assert(sents("!. ?!") === Seq("!.", "?!"))
  }

  test("pass flag thresholds, integer-exact") {
    // 50 clean stop-heavy words, mean length in band → pass
    val good = ("the and " * 25).trim
    assert(g(good)(0) == 50)
    assert(g(good)(8) == 1)
    // 49 words → fail on the count floor alone
    val short49 = ("the and " * 24).trim + " the"
    assert(g(short49)(0) == 49)
    assert(g(short49)(8) == 0)
    // symbol flood breaks the 10% bound
    assert(g(good + " " + ("x# " * 20).trim)(8) == 0)
    // all-numeric words break the 80% alpha floor
    assert(g(("1234 3456 " * 25).trim + " the and")(8) == 0)
  }
}
