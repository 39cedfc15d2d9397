package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Salt
import graft.ops.GraftFunctions

/** The custom expressions must be reachable from plain SQL text, matching
  * their DataFrame twins. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registered SQL functions match the column API") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, "/root/testdata/sf0.001")

    val salt = spark.sql("SELECT salt_bucket('lotA') AS s").collect()(0).getInt(0)
    assert(salt === Salt.bucket("lotA"))

    val sim = spark.sql(
      """SELECT doc_id, simhash64(filter(split(lower(text), '\\s+'),
        |  t -> length(t) > 0)) AS sig
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin).collect()
    assert(sim.length === 3)
    assert(sim.map(_.getLong(1)).distinct.length === 3)

    val q = spark.sql(
      "SELECT quality_stats(text).stopword_ratio AS r FROM documents LIMIT 1")
      .collect()(0).getDouble(0)
    assert(q >= 0.0 && q <= 1.0)

    val ng = spark.sql(
      "SELECT size(word_ngrams(split('a b c d', ' '))) AS n").collect()(0).getInt(0)
    assert(ng === 3) // bigrams of 4 tokens

    val dot = spark.sql(
      "SELECT vec_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 32.0)

    // image perceptual hashes over a binary column from SQL: a real
    // PNG hashes to a long, foreign bytes hash to NULL (totality)
    val ih = spark.sql(
      s"""SELECT image_dhash64(unhex('${graft.multimodal.Images
            .encodePng(9, 8, k => ((k * 13) % 256))
            .map(b => f"$b%02X").mkString}')) AS d,
         |  image_ahash64(cast('junk' AS binary)) AS a""".stripMargin)
      .collect()(0)
    assert(!ih.isNullAt(0) && ih.isNullAt(1))

    // aggregate surface: vec_sum and pack_agg through plain SQL
    val vs = spark.sql(
      """SELECT vec_sum(v) AS s FROM VALUES (array(1d, 2d)), (array(3d, 4d)) t(v)""")
      .collect()(0).getSeq[Double](0)
    assert(vs === Seq(4.0, 6.0))

    val pk = spark.sql(
      """SELECT pack_agg(v) AS cell FROM VALUES ('b'), ('a') t(v)""")
      .collect()(0).getString(0)
    assert(pk === "2\u0000a\nb")
  }

  test("withExtensions injects the functions at session build") {
    // extension-built session shares the local JVM; use a derived session
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT salt_bucket('x') AS s").collect()(0).getInt(0)
      === Salt.bucket("x"))
  }
}
