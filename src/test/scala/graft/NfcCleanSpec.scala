package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextKernels
import graft.text.TextOps
import org.apache.spark.unsafe.types.UTF8String

/** Unicode hygiene kernel: NFC composition + control/zero-width strip.
  * Non-ASCII chars are built with toChar so the source stays ASCII and
  * no editor/tool can silently re-normalize the test inputs. */
class NfcCleanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val combAcute = 0x0301.toChar.toString  // combining acute
  private val eAcute = 0x00E9.toChar.toString     // precomposed e-acute
  private val angstromSign = 0x212B.toChar.toString
  private val aRing = 0x00C5.toChar.toString
  private val zwsp = 0x200B.toChar.toString
  private val zwnj = 0x200C.toChar.toString
  private val zwj = 0x200D.toChar.toString
  private val bom = 0xFEFF.toChar.toString
  private val bel = 0x0007.toChar.toString
  private val combDiaer = 0x0308.toChar.toString
  private val uUml = 0x00FC.toChar.toString

  private def clean(s: String): String =
    TextKernels.nfcClean(UTF8String.fromString(s)).toString

  test("kernel composes NFD sequences and strips junk") {
    assert(clean("Cafe" + combAcute) === "Caf" + eAcute)
    assert(clean(angstromSign) === aRing) // angstrom sign -> A-ring
    assert(clean("a" + zwsp + "b" + zwnj + "c" + zwj + "d" + bom + "e") === "abcde")
    assert(clean("bell" + bel + " kept\ttab\nline\rcr") === "bell kept\ttab\nline\rcr")
    assert(clean("") === "")
    // already-clean ASCII passes through untouched
    assert(clean("plain text") === "plain text")
  }

  test("composition variants hash identically after cleaning") {
    val docs = Seq(
      (1L, "Cafe" + combAcute + " menu"), // NFD
      (2L, "Caf" + eAcute + " menu")      // NFC
    ).toDF("doc_id", "text")
    val hashes = docs.select(md5(TextOps.nfcClean(col("text"))).as("h"))
      .distinct().count()
    assert(hashes === 1L)
  }

  test("interpreted eval and codegen agree") {
    val rows = Seq("Cafe" + combAcute, "u" + combDiaer + "ber",
        "x" + zwsp + "y", "a" + bel + "b", "plain")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("id", "text")
    val viaCodegen = df.select(col("id"), TextOps.nfcClean(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (i, t) =>
      assert(viaCodegen(i) === clean(t), s"row $i")
    }
  }

  test("nfc_clean is reachable from SQL") {
    graft.ops.GraftFunctions.register(spark)
    val out = spark.sql(s"SELECT nfc_clean('Cafe$combAcute') AS c").head().getString(0)
    assert(out === "Caf" + eAcute)
    assert(spark.sql("SELECT nfc_clean(NULL) AS c").head().isNullAt(0))
  }

  test("fixture file carries the intended raw byte sequences") {
    // guard against any tool re-normalizing the checked-in fixture: the
    // NFD row must really be decomposed and the zero-widths present
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/unicode.csv")), "UTF-8")
      .split("\n")
    assert(lines(0).contains("Cafe" + combAcute), "row 1 must be NFD")
    assert(lines(1).contains("Caf" + eAcute), "row 2 must be precomposed")
    assert(lines(2).contains(angstromSign), "row 3 must keep the angstrom sign")
    assert(lines(3).contains(zwsp), "row 4 must keep the zero-width space")
    assert(lines(4).contains(bel), "row 5 must keep the control char")
  }
}
