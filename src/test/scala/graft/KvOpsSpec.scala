package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Delims, Salt}
import graft.ingest.{KvStore, MucrReader}
import graft.ops.{KvOps, SaltExpr}

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class KvOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("SaltBucket expression matches pure-core salt and the UDF") {
    val df = Seq("lotA\u0000202032\u00002\u00001001", "", "B\u00001\u00002\u00003", "xyz")
      .toDF("k")
      .withColumn("exprSalt", SaltExpr.saltCol(col("k")))
      .withColumn("udfSalt", KvOps.saltUdf(col("k")))
    val rows = df.collect()
    for (r <- rows) {
      val k = r.getString(0)
      assert(r.getInt(1) === Salt.bucket(k), s"expr for '$k'")
      assert(r.getInt(2) === Salt.bucket(k), s"udf for '$k'")
    }
  }

  test("pack → unpack round-trips a long-format table") {
    val src = Seq(
      ("lotA", 1, "t_a", "0.5\u0000P"),
      ("lotA", 1, "t_a", "0.7\u0000F"),
      ("lotA", 1, "t_b", "1.5\u0000P"),
      ("lotA", 2, "t_a", "2.5\u0000P"),
      ("lotB", 1, "t_c", "\u0000"), // empty fields survive
    ).toDF("lot", "unit", "testName", "measure")

    val kv = KvStore.pack(src,
      keyParts = Seq(col("lot"), col("unit")),
      qualifier = col("testName"),
      valueParts = Seq(col("measure")))

    // salt column is consistent with rowKey
    for (r <- kv.select("rowKey", "salt").collect())
      assert(r.getInt(1) === Salt.bucket(r.getString(0)))

    val back = KvStore.unpack(kv)
      .select(col("rowKey"), col("columnName"), col("packedValue"))
    val expected = src.select(
      KvOps.rowKeyCol(Seq(col("lot"), col("unit"))).as("rowKey"),
      col("testName").as("columnName"),
      col("measure").as("packedValue"))
    assert(back.except(expected).count() === 0)
    assert(expected.except(back).count() === 0)
    assert(back.count() === expected.count())
  }

  test("null values: count prefix equals packed (non-null) values; salt total") {
    val src = Seq(("k", "q", Some("a")), ("k", "q", None), ("k", "q", Some("b")))
      .toDF("k", "q", "v")
    val kv = KvStore.pack(src, Seq(col("k")), col("q"), Seq(col("v")))
    // concat_ws drops the null part → "" packs; count must equal body size
    val cell = kv.select("value").as[String].head()
    val (n, vals) = graft.core.Cell.unpack(cell)
    assert(n === vals.length)
    // salt expression is total: null key → bucket 0, never a null salt
    val s = Seq(Option.empty[String]).toDF("k")
      .select(SaltExpr.saltCol(col("k"))).as[Int].head()
    assert(s === 0)
  }

  test("zero-count cells unpack to zero rows; one-empty-value cells to one") {
    val kv = Seq(
      ("k1", "q", "0" + Delims.Delim),       // zero packed values
      ("k2", "q", "1" + Delims.Delim)        // one packed empty value
    ).toDF("rowKey", "columnName", "value")
    val out = KvOps.unpackCells(kv)
    assert(out.where(col("rowKey") === "k1").count() === 0)
    val k2 = out.where(col("rowKey") === "k2").select("packedValue")
      .as[String].collect()
    assert(k2.toSeq === Seq(""))
  }

  test("MUCR zero-counter lines emit zero rows, not errors") {
    val lines = Seq(
      Seq("1001", "1", "TP", "P", "SS01", "0").mkString(Delims.Delim),
      Seq("1002", "1", "TP", "P", "SS01", "1", "C", "2", "1").mkString(Delims.Delim)
    ).toDF("value")
    val parsed = MucrReader.parse(lines)
    assert(parsed.count() === 1)
    assert(parsed.select("Unit_Testing_Seq_Key").as[String].head() === "1002")
  }

  test("MUCR parse is total under ANSI: malformed lines degrade, never throw") {
    val lines = Seq(
      // well-formed: 1 counter
      Seq("1001", "1", "TP", "P", "SS01", "1", "C", "2", "1").mkString(Delims.Delim),
      // declares 2 counters, carries ONE triple → clamped to 1 row
      Seq("1002", "1", "TP", "P", "SS01", "2", "C", "2", "1").mkString(Delims.Delim),
      // non-numeric count → null n → zero counter rows (not CAST_INVALID_INPUT)
      Seq("1003", "1", "TP", "P", "SS01", "X", "C", "2", "1").mkString(Delims.Delim),
      // fewer than 6 fixed fields → null fields, zero counter rows
      Seq("1004", "1").mkString(Delims.Delim),
      // hostile declared count near Int.MaxValue: n*3 must not overflow
      // IntegerType (ANSI would throw, killing the whole batch) — the
      // line routes to corrupt like any other declared-vs-present gap
      Seq("1005", "1", "TP", "P", "SS01", "1000000000", "C", "2", "1")
        .mkString(Delims.Delim)
    ).toDF("value")
    // the whole frame parses without a task failure (ANSI is on by default)
    val parsed = MucrReader.parse(lines)
    // 1001's counter + the clamped single counters of 1002 and 1005
    assert(parsed.count() === 3)
    assert(parsed.select("Unit_Testing_Seq_Key").as[String].collect().sorted
      === Array("1001", "1002", "1005"))
    // quarantine split: parse keeps the well-formed, corrupt keeps the rest
    val clean = MucrReader.parseClean(lines)
    assert(clean.select("Unit_Testing_Seq_Key").as[String].collect().toSeq
      === Seq("1001"))
    val corrupt = MucrReader.parseCorrupt(lines)
      .as[String].collect().map(_.split(Delims.Delim)(0)).sorted
    assert(corrupt.toSeq === Seq("1002", "1003", "1004", "1005"))
  }

  test("cell count prefix matches group size") {
    val src = Seq(("k", "q", "a"), ("k", "q", "b"), ("k", "q", "c"))
      .toDF("k", "q", "v")
    val kv = KvStore.pack(src, Seq(col("k")), col("q"), Seq(col("v")))
    val n = kv.select(KvOps.cellCount(col("value"))).as[Int].head()
    assert(n === 3)
  }

  test("multi-character delimiters strip cleanly (no tail contamination)") {
    // the public delim parameter admits multi-char delimiters; the body
    // must start AFTER the whole delimiter, not one char into it
    val df = Seq(Tuple1("2<|>a\nb")).toDF("value")
    assert(df.select(KvOps.stripCountPrefix(col("value"), delim = "<|>"))
      .head().getString(0) === "a\nb")
    assert(df.select(KvOps.cellCount(col("value"), delim = "<|>"))
      .head().getInt(0) === 2)
  }

  test("corrupt cells degrade to null/zero rows instead of fabricated payload") {
    // a cell missing the count prefix entirely (no delimiter): count is
    // null, the body is null, and unpack emits NO payload rows — never
    // the raw cell content laundered as a value
    val corrupt = Seq(("k1", "q1", "no-delimiter-here")).toDF("rowKey", "columnName", "value")
    assert(corrupt.select(KvOps.cellCount(col("value"))).head().isNullAt(0))
    assert(corrupt.select(KvOps.stripCountPrefix(col("value"))).head().isNullAt(0))
    assert(KvStore.unpack(corrupt).count() === 0)
    // corrupt cells remain FINDABLE for a dead-letter audit
    assert(corrupt.where(KvOps.cellCount(col("value")).isNull).count() === 1)
    // a non-numeric prefix likewise: null count, no rows, no ANSI crash
    val badPrefix = Seq(("k1", "q1", "x" + graft.core.Delims.Delim + "payload"))
      .toDF("rowKey", "columnName", "value")
    assert(KvStore.unpack(badPrefix).count() === 0)
    // a BARE-NUMERIC cell ("5", no delimiter): the prefix parses as a
    // count, so cellCount.isNull misses it — but it has no body and must
    // still quarantine (zero rows) and stay findable via the audit
    // predicate that covers the whole dropped class
    val bare = Seq(("k1", "q1", "5")).toDF("rowKey", "columnName", "value")
    assert(KvStore.unpack(bare).count() === 0)
    assert(bare.where(KvOps.cellCount(col("value")).isNull).count() === 0)
    assert(bare.where(KvOps.isCorruptPackedCell(col("value"))).count() === 1)
    // …while the audit predicate stays FALSE for every healthy shape
    val healthy = Seq(
      ("k", "q", "0" + graft.core.Delims.Delim),
      ("k", "q", "1" + graft.core.Delims.Delim + "payload"))
      .toDF("rowKey", "columnName", "value")
    assert(healthy.where(KvOps.isCorruptPackedCell(col("value"))).count() === 0)
    // a ZERO count over a non-empty body: unpack trusts the count (no
    // rows), so the stray payload must be flagged, not laundered or lost
    val zeroBody = Seq(("k1", "q1", "0" + graft.core.Delims.Delim + "stray"))
      .toDF("rowKey", "columnName", "value")
    assert(KvStore.unpack(zeroBody).count() === 0)
    assert(zeroBody.where(KvOps.isCorruptPackedCell(col("value"))).count() === 1)
  }

  test("bulkGet joins probe keys against the store") {
    val src = Seq(("k1", "q1", "a"), ("k2", "q1", "b"), ("k3", "q2", "c"))
      .toDF("k", "q", "v")
    val kv = KvStore.pack(src, Seq(col("k")), col("q"), Seq(col("v")))
    val probes = Seq(("k1", "q1"), ("k3", "q2"), ("k9", "q1"))
      .toDF("rowKey", "columnName")
    val got = KvStore.bulkGet(kv, probes)
    assert(got.count() === 2) // absent keys yield nothing (inner)
  }

  test("MUCR repeating-group parse explodes counters") {
    val lines = Seq(
      "1001\u00003\u0000TP_A\u0000P\u0000SS01\u00002\u0000CNT_A\u00004\u00001\u0000CNT_LONG_B\u00009\u00002",
      "1002\u00001\u0000TP_A\u0000F\u0000SS02\u00001\u0000C\u00002\u00001"
    ).toDF("value")
    val parsed = MucrReader.parse(lines)
    assert(parsed.count() === 3)
    val first = parsed.filter(col("Unit_Counter_ID") === "CNT_A").head()
    assert(first.getAs[String]("Unit_Testing_Seq_Key") === "1001")
    assert(first.getAs[String]("Repeating_Counter_Occurrences") === "4")
    // hex(len("CNT_A")) = hex(5) = "5"; hex(len("CNT_LONG_B")) = hex(10) = "a"
    val hexes = parsed.select("Unit_Counter_ID", "Unit_Counter_ID_hex_len")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(hexes("CNT_A") === "5")
    assert(hexes("CNT_LONG_B") === "a")
    // qualifier = flg ++ hexlen ++ id
    val q = parsed.withColumn("q", MucrReader.qualifierCol)
      .filter(col("Unit_Counter_ID") === "CNT_LONG_B")
      .select("q").as[String].head()
    assert(q === "PaCNT_LONG_B")
  }

  test("kvParse maps k=v arrays") {
    val df = Seq(Seq("col1=a", "col2=b", "col3=c")).toDF("details")
      .select(KvOps.kvParse(col("details")).as("m"))
    val m = df.select(element_at(col("m"), "col2")).as[String].head()
    assert(m === "b")
    // a bare token (no '=') maps to a NULL value — the old fall-through
    // fabricated value == key, indistinguishable from "debug=debug"
    val bare = Seq(Seq("debug", "k=v")).toDF("details")
      .select(KvOps.kvParse(col("details")).as("m"))
    assert(bare.select(element_at(col("m"), "debug")).head().isNullAt(0))
    assert(bare.select(element_at(col("m"), "k")).as[String].head() === "v")
    // dirty arrays must DEGRADE like the reference's toMap, not throw:
    // duplicate keys keep the LAST value (bare map_from_entries raises
    // DUPLICATED_MAP_KEY), and null entries are skipped
    val dirty = Seq(Seq("mode=a", null, "mode=b", "x=1")).toDF("details")
      .select(KvOps.kvParse(col("details")).as("m"))
    assert(dirty.select(element_at(col("m"), "mode")).as[String].head() === "b")
    assert(dirty.select(element_at(col("m"), "x")).as[String].head() === "1")
    assert(dirty.select(size(map_keys(col("m")))).as[Int].head() === 2)
  }

  test("exprWs builds SQL text accepted by selectExpr") {
    val df = Seq(("a", "b")).toDF("x", "y")
      .selectExpr(KvOps.exprWs("|", "x", "y") + " as joined")
    assert(df.as[String].head() === "a|b")
  }

  test("splitKeepTrailing preserves trailing empties in a column") {
    val df = Seq("a\u0000\u0000").toDF("s")
      .select(size(KvOps.splitKeepTrailing(col("s"), "\u0000")))
    assert(df.as[Int].head() === 3)
  }
}
