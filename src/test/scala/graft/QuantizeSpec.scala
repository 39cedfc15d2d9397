package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Quantize

/** r21 optimization guard: Quantize.quantize moved from a five-lambda
  * declarative construction to one codegen kernel call. This spec
  * replays the OLD column form against the kernel — scale and codes
  * must be bit-identical on the real corpus AND on every hostile edge
  * the old expression tree had defined behavior for (null vector, null
  * elements, NaN/±∞, empty array, zero and subnormal vectors). */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The pre-r21 declarative construction, verbatim. */
  private def oldQuantize(vec: Column): Column = {
    val v = transform(vec, _.cast("double"))
    val amax = array_max(transform(v, x => abs(x)))
    val scale = amax / 127.0
    val zeros = transform(v, _ => lit(0))
    val q = when(scale.isNull || scale === 0.0, zeros)
      .otherwise(transform(v, x =>
        least(lit(127.0), greatest(lit(-127.0), round(x / scale))).cast("int")))
    struct(coalesce(scale, lit(0.0)).as("scale"), q.as("q"))
  }

  private def compareOn(df: org.apache.spark.sql.DataFrame,
                        vec: Column): Unit = {
    val rows = df.select(
      Quantize.quantize(vec).as("n"), oldQuantize(vec).as("o")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getStruct(0); val o = r.getStruct(1)
      assert(java.lang.Double.compare(n.getDouble(0), o.getDouble(0)) == 0,
        s"scale diverges: ${n.getDouble(0)} vs ${o.getDouble(0)}")
      assert(n.getSeq[Int](1) === o.getSeq[Int](1),
        s"codes diverge for scale ${o.getDouble(0)}")
    }
  }

  test("kernel matches the expression form on the real corpus") {
    compareOn(Tables(spark, "/root/testdata/sf0.001", "embeddings"),
      col("embedding"))
  }

  test("kernel matches the expression form on hostile vectors") {
    val hostile: Seq[Seq[java.lang.Double]] = Seq(
      null, // null vector → (0.0, null codes), never a null row
      Seq.empty[java.lang.Double], // empty → (0.0, [])
      Seq[java.lang.Double](0.0, 0.0), // zero vector → zeros
      Seq[java.lang.Double](-0.0, 0.0), // signed zero
      Seq[java.lang.Double](1.0, null, -2.0), // null element → code −127
      Seq[java.lang.Double](null, null), // all-null → scale null → zeros
      Seq[java.lang.Double](Double.NaN, 1.0), // NaN amax → saturate 127
      Seq[java.lang.Double](Double.PositiveInfinity, 1.0),
      Seq[java.lang.Double](Double.NegativeInfinity, 3.5),
      Seq[java.lang.Double](java.lang.Double.MIN_VALUE, 0.0), // subnormal: scale underflows to 0 → zeros
      Seq[java.lang.Double](1.5, -1.5, 0.5), // HALF_UP tie rounding
      Seq[java.lang.Double](126.4999, -126.5, 127.0))
    compareOn(hostile.toDF("v"), col("v"))
  }

  test("kernel matches on float input arrays") {
    val f = Seq(
      Array(1.0f, -2.5f, 3.75f, 0.25f),
      Array(Float.NaN, 2.0f),
      Array.empty[Float]).toDF("v")
    compareOn(f, col("v"))
  }
}
