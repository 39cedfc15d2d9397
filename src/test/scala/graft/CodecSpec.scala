package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.core.{Cell, Delims, RowKey, Salt, Splits}

/** Pure-core semantics: salt golden vectors (computed from the reference
  * formula, Utils.scala:82-96), pack/unpack round-trip, trailing-empty
  * split (Utils.scala:853-876). Property-style checks use a fixed-seed
  * Random so failures reproduce. */
class CodecSpec extends AnyFunSuite {

  // Independent reimplementation of the reference arithmetic
  // (seed 1, 31*h+byte over UTF-8 bytes, Int overflow, abs(% 24)).
  private def refSalt(s: String): Int = {
    if (s.isEmpty) 0
    else {
      var h = 1
      for (b <- s.getBytes("UTF-8")) h = 31 * h + b.toInt
      math.abs(h % 24)
    }
  }

  private val rnd = new Random(42)
  private def randStr(maxLen: Int, chars: String): String =
    (0 until rnd.nextInt(maxLen)).map(_ => chars(rnd.nextInt(chars.length))).mkString
  private val alnum = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  test("salt matches reference arithmetic on golden vectors") {
    val vectors = Seq(
      "", "A", "lotA\u0000202032\u00002\u00001001",
      "B\u0000202033\u00001\u00009999", "x" * 100, "αβγ", "1234567890")
    for (v <- vectors) assert(Salt.bucket(v) === refSalt(v), s"for $v")
  }

  test("salt is stable and in range (property)") {
    for (_ <- 1 to 500) {
      val s = randStr(40, alnum + " _-.:#αβ")
      val x = Salt.bucket(s)
      assert(x >= 0 && x < 24)
      assert(x === Salt.bucket(s))
      assert(x === refSalt(s))
    }
  }

  test("pack/unpack round-trip (property)") {
    for (_ <- 1 to 500) {
      val vals = (0 until (1 + rnd.nextInt(10))).map(_ => randStr(12, alnum + " ,=."))
      val (n, out) = Cell.unpack(Cell.pack(vals))
      assert(n === vals.length)
      assert(out === vals)
    }
  }

  test("pack format: count prefix + newline-joined body") {
    assert(Cell.pack(Seq("a\u00001", "b\u00002")) ===
      "2\u0000a\u00001\nb\u00002")
    assert(Cell.unpack("2\u0000a\u00001\nb\u00002") ===
      ((2, Seq("a\u00001", "b\u00002"))))
  }

  test("unpack preserves trailing empty payload fields") {
    // the exact bug the reference hand-rolled getSplitsFromString around
    val (n, vals) = Cell.unpack("3\u0000a\n\n")
    assert(n === 3)
    assert(vals === Seq("a", "", ""))
  }

  test("keepTrailing rejects an empty separator instead of spinning forever") {
    // indexOf("", start) == start: the loop would never advance and the
    // buffer would grow to OOM
    val e = intercept[IllegalArgumentException](Splits.keepTrailing("abc", ""))
    assert(e.getMessage.contains("non-empty"))
  }

  test("keepTrailing matches split(-1) semantics") {
    assert(Splits.keepTrailing("a\u0000\u0000b\u0000\u0000", "\u0000").toSeq ===
      Seq("a", "", "b", "", ""))
    assert(Splits.keepTrailing("", "\u0000").toSeq === Seq(""))
    for (_ <- 1 to 500) {
      val sep = Seq("\u0000", ",", "::")(rnd.nextInt(3))
      val s = (0 until rnd.nextInt(8)).map(_ => randStr(6, alnum)).mkString(sep)
      assert(Splits.keepTrailing(s, sep).toSeq === s.split(
        java.util.regex.Pattern.quote(sep), -1).toSeq)
    }
  }

  test("rowKey assemble/parse round-trip") {
    val parts = Seq("lotA", "202032", "2", "1001")
    assert(RowKey.parse(RowKey.assemble(parts)).toSeq === parts)
  }

  test("delimiter constants match the reference") {
    assert(Delims.Delim === "\u0000")
    assert(Delims.DelimComma === ",")
    assert(Delims.NullByteReplace === "<NB>")
  }

  test("byte-level salted rowkey: salt byte ++ UTF-8 key, round-trip") {
    // reference shape: Bytes.add(Array(saltByte), key.getBytes)
    // (Utils.scala:62-64); golden vectors cover ASCII, delimiters,
    // non-ASCII and the empty-key early return (salt 0)
    for (key <- Seq("LOTA\u0000202032\u00002\u00001", "", "a",
        "k\u00e4se-key", "10023")) {
      val bytes = RowKey.saltedBytes(key)
      val kb = key.getBytes("UTF-8")
      assert(bytes.length === kb.length + 1)
      assert(bytes(0) === Salt.bucket(key).toByte)
      assert(bytes.drop(1).toSeq === kb.toSeq)
      if (key.nonEmpty || bytes.length == 1)
        assert(RowKey.fromSaltedBytes(bytes) === ((Salt.bucket(key), key)))
    }
  }

  test("Spark hbaseKeyBytes column equals the core codec") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val keys = Seq("LOTA\u0000202032\u00002\u00001", "a", "x|y", "10023", "zz-9")
    val got = keys.toDF("k")
      .select(graft.ops.KvOps.hbaseKeyBytes(col("k")))
      .collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(got === keys.map(k => RowKey.saltedBytes(k).toSeq))
  }
}
