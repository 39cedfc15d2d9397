package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Delims, Salt}

/** Column-level operator library for the salted-KV data model — each §2
  * operator of SURVEY.md re-expressed as a pure Catalyst expression so the
  * whole lifecycle stays inside WholeStageCodegen (the reference broke
  * codegen with typed maps at Utils.scala:229-233, 565-569 and an RDD hop
  * at :417; none of those survive here).
  *
  * All functions take/return [[Column]] so they compose into a single
  * LogicalPlan — nothing collects to the driver.
  */
object KvOps {

  /** Reference-parity UDF form of the salt (Utils.scala:158, 495). Prefer
    * [[SaltExpr.saltCol]] (codegen) in production plans. */
  val saltUdf = udf((s: String) => Salt.bucket(s))

  /** Row-key assembly: delim-joined key parts (Utils.scala:212-214).
    * `concat_ws` drops nulls — matching the reference, whose key columns
    * are declared non-nullable. */
  def rowKeyCol(parts: Seq[Column], delim: String = Delims.Delim): Column =
    concat_ws(delim, parts: _*)

  /** Byte-parity HBase rowkey (F14): raw salt byte ++ UTF-8 key bytes
    * (`Bytes.add(Array(saltByte), rowKeyPart2.getBytes)`,
    * Utils.scala:62-64) as a BINARY column — for exports that must be
    * byte-compatible with reference-written HBase keys. Pure builtins:
    * salt < 24 < 0x80, so `encode(chr(salt))` is exactly the one raw
    * byte, and the whole expression stays in codegen. Spec-pinned
    * equivalent to [[graft.core.RowKey.saltedBytes]]. */
  def hbaseKeyBytes(key: Column): Column =
    concat(encode(chr(SaltExpr.saltCol(key)), "UTF-8"),
      encode(key, "UTF-8"))

  /** Pack aggregation — the core "many measurement rows → one cell"
    * operator. Fuses the reference's groupBy+collect_list (Utils.scala:
    * 225-227), per-group sort (:53), count prefix (:56) and newline join
    * (:229-233) into ONE aggregate expression:
    *
    *   `count(*) <delim> array_join(sort_array(collect_list(v)), "\n")`
    *
    * Map-side partial aggregation applies (collect_list supports partial
    * merge), and the sort is per-group on the reduced list — no global
    * sort, no typed map, no extra shuffle. Deterministic for the oracle.
    */
  def packAgg(value: Column, delim: String = Delims.Delim): Column =
    concat(
      // count(value), not count(*): collect_list drops nulls, and the
      // prefix must equal the number of packed values (also keeps this
      // form identical to PackAggregate, which skips nulls in update)
      count(value).cast("string"),
      lit(delim),
      array_join(sort_array(collect_list(value)), Delims.RowSep))

  /** Strip the `n\0` count prefix from a packed cell (Utils.scala:325-326):
    * everything after the first delimiter. NULL when the cell has no
    * delimiter at all — that's not a packed cell, and echoing its whole
    * content back as "the body" would launder what should have been the
    * count prefix into payload (the reference UDF at least failed
    * loudly there; fabricating values is worse). */
  def stripCountPrefix(cell: Column, delim: String = Delims.Delim): Column =
    when(instr(cell, delim) > 0, expr_substr_after(cell, delim))

  // the caller guards delimiter presence: instr = 0 would make this
  // substr(len, MAX) — a prefix-contaminated slice of the input.
  // `+ delim.length`, not `+ 1`: the public delim parameter admits
  // multi-character delimiters, and skipping one char would prepend the
  // delimiter's tail to every body
  private def expr_substr_after(c: Column, delim: String): Column =
    c.substr(instr(c, delim) + delim.length, lit(Int.MaxValue))

  /** Packed-row count from the cell prefix (the `n` of A4). try_cast,
    * not cast: unpack is a public API over externally-readable parquet,
    * and under ANSI mode (the Spark 4 default) a corrupt cell's
    * non-numeric prefix would otherwise kill the whole job instead of
    * yielding a null count for that one cell. */
  def cellCount(cell: Column, delim: String = Delims.Delim): Column =
    substring_index(cell, delim, 1).try_cast("int")

  /** Audit predicate for [[unpackCells]]' quarantine semantics: true for
    * every cell that unpack drops without payload rows — a non-numeric
    * count prefix, no delimiter at all (a bare numeric like "5" parses
    * as a count but carries no body), or a ZERO count prefix over a
    * non-empty body ("0<delim>x": unpack trusts the count and emits no
    * rows, so the stray payload must stay findable). Route
    * `kv.where(isCorruptPackedCell(col("value")))` to a dead-letter sink
    * so quarantined cells stay findable. */
  def isCorruptPackedCell(cell: Column, delim: String = Delims.Delim): Column =
    cellCount(cell, delim).isNull || instr(cell, delim) === 0 ||
      (cellCount(cell, delim) === 0 && stripCountPrefix(cell, delim) =!= "")

  /** Unpack a packed KV table back to long format — the reference's
    * `hbaseTableToDataFrame` + `hbaseDataFrameSplit` (Utils.scala:377-402)
    * as split + explode. Input columns: (rowKey, columnName, value);
    * output: one row per packed value.
    *
    * Splits use limit -1 so trailing empty fields survive — the exact
    * semantics the reference hand-rolled in `getSplitsFromString`
    * (Utils.scala:853-876).
    */
  def unpackCells(kv: DataFrame, delim: String = Delims.Delim): DataFrame =
    kv.withColumn("__body", stripCountPrefix(col("value"), delim))
      // a zero-count cell ("0<delim>") has an empty body that must yield
      // ZERO rows — but split("", -1) returns [""], which is also the
      // legitimate payload of a one-empty-value cell; the count prefix
      // disambiguates
      .withColumn("packedValue",
        // corrupt cells (non-numeric prefix, or a delimiter-less cell —
        // whose __body is null even when its bare content parses as a
        // count) emit NO payload rows rather than exploding garbage;
        // find them with where(isCorruptPackedCell(col("value")))
        explode(when(cellCount(col("value"), delim) === 0
            || isCorruptPackedCell(col("value"), delim),
          array().cast("array<string>"))
          .otherwise(split(col("__body"),
            java.util.regex.Pattern.quote(Delims.RowSep), -1))))
      .drop("__body", "value")

  /** Trailing-empty-preserving split (F12): `split(c, sep, -1)`. */
  def splitKeepTrailing(c: Column, sep: String): Column =
    split(c, java.util.regex.Pattern.quote(sep), -1)

  /** Prefix scan (S6/P4): HBase `PrefixFilter` → `startsWith`, which
    * Catalyst pushes to Parquet as a min/max range predicate. */
  def prefixScan(df: DataFrame, keyCol: String, prefix: String): DataFrame =
    df.filter(col(keyCol).startsWith(prefix))

  /** k=v detail parser (F6, Utils.scala:112-115): array of "k=v" strings →
    * map. Pure expression replacement for the reference's `getColumnsUDF`.
    * An entry with NO '=' maps its token to a null value — the old
    * fall-through returned the whole token as its own value ("debug" →
    * "debug"), indistinguishable from a genuine `debug=debug` entry.
    *
    * Total on dirty arrays, like the reference's `toMap`: null entries
    * are skipped, and a DUPLICATE key keeps its LAST value — a bare
    * `map_from_entries` instead throws DUPLICATED_MAP_KEY (the Spark
    * default dedup policy), letting one malformed log line kill a
    * corpus-scale job. The dedup filter is O(n²) in the entry count;
    * detail lists are a handful of fields (the reference's are 4-6). */
  def kvParse(details: Column): Column = {
    val entries = transform(filter(details, s => s.isNotNull), s =>
      struct(
        substring_index(s, "=", 1).as("key"),
        when(s.contains("="), expr_substr_after(s, "=")).as("value")))
    map_from_entries(filter(entries, (e, i) =>
      !exists(slice(entries, i + 2, size(entries)),
        later => later.getField("key") === e.getField("key"))))
  }

  /** Escape/unescape payload values that contain the cell delimiters —
    * wiring in the `<NB>` escape hatch the reference DECLARED
    * (Utils.scala:33) but never connected, which left delimiter-bearing
    * values silently corrupting cells. Escape order matters: the token
    * itself first, then the delimiters. The pair is parameterized by the
    * SAME field delimiter as pack/unpack — escaping the default NUL
    * while packing with a custom delimiter would leave the custom
    * delimiter unprotected. */
  // prefix code: every escaped unit is "<NB>" + one tag char (e|0|n) and
  // no raw "<NB>" survives escaping, so left-to-right decode is
  // unambiguous (decode tags before the token itself)
  def escapeValue(v: Column, delim: String = Delims.Delim): Column = {
    val esc = Delims.NullByteReplace
    regexp_replace(
      regexp_replace(
        regexp_replace(v, java.util.regex.Pattern.quote(esc), esc + "e"),
        java.util.regex.Pattern.quote(delim), esc + "0"),
      Delims.RowSep, esc + "n")
  }

  def unescapeValue(v: Column, delim: String = Delims.Delim): Column = {
    val esc = java.util.regex.Pattern.quote(Delims.NullByteReplace)
    regexp_replace(
      regexp_replace(
        regexp_replace(v, esc + "n", Delims.RowSep),
        esc + "0", java.util.regex.Matcher.quoteReplacement(delim)),
      esc + "e", Delims.NullByteReplace)
  }

  /** SQL-fragment builders (F7, Utils.scala:607-624): emit `concat_ws`/
    * `concat` SQL text for `selectExpr`/`expr` — proves the engine accepts
    * queries as SQL-expression strings. */
  def exprWs(delim: String, cols: String*): String =
    cols.mkString(s"concat_ws('$delim', ", ", ", ")")
  def exprConcat(cols: String*): String =
    cols.mkString("concat(", ", ", ")")
}
