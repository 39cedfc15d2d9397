package graft.core

/** Pure (Spark-free) KV-codec core: delimiters, salt, row-key assembly,
  * cell pack/unpack, trailing-empty-preserving split.
  *
  * Semantics derived from the reference engine's behavior
  * (`/root/reference/src/main/scala/com/intel/midas/Utils.scala`):
  * delimiter constants (Utils.scala:31-33), salt (Utils.scala:82-96),
  * row-key assembly (Utils.scala:62-64, 212-214), cell payload packing
  * (Utils.scala:49-80, 203-211), count-prefix strip (Utils.scala:325-326),
  * trailing-empty split (Utils.scala:853-876).
  */
object Delims {
  /** Primary field delimiter: the null byte (Utils.scala:31). */
  final val Delim = "\u0000"
  final val DelimComma = ","
  /** Escape token declared (but never wired in) by the reference
    * (Utils.scala:33). Kept for API parity. */
  final val NullByteReplace = "<NB>"
  /** Payload row separator inside a packed cell (Utils.scala:56). */
  final val RowSep = "\n"
}

object Salt {
  /** Number of salt buckets (Utils.scala:93). */
  final val Buckets = 24

  /** Java-String-hash-with-seed-1 over UTF-8 bytes, 32-bit overflow
    * semantics, then `abs(result % buckets)` (Utils.scala:82-96).
    * Empty string → 0, matching the reference's early return.
    */
  def bucket(s: String, buckets: Int = Buckets): Int =
    if (s == null) 0 else bucket(s.getBytes("UTF-8"), buckets)

  /** Byte-level form — the ground truth both the interpreted and codegen
    * paths of [[graft.ops.SaltBucket]] call, so hostile (non-UTF-8) key
    * bytes hash identically everywhere (String round-trips would smear
    * invalid sequences into U+FFFD first). */
  def bucket(a: Array[Byte], buckets: Int): Int = {
    if (a == null || a.length == 0) return 0
    var result = 1
    var i = 0
    while (i < a.length) {
      result = 31 * result + a(i).toInt // Int overflow intended
      i += 1
    }
    math.abs(result % buckets)
  }
}

object RowKey {
  /** `Lot\0Lato_Start_WW\0Lots_seq_key\0Unit_Testing_Seq_Key`
    * (Utils.scala:212-214, 62-64). */
  def assemble(parts: Seq[String]): String = parts.mkString(Delims.Delim)
  def parse(key: String): Array[String] = Splits.keepTrailing(key, Delims.Delim)

  /** Byte-level HBase rowkey (F14): ONE raw salt byte (0..23) prepended
    * to the UTF-8 key bytes — `Bytes.add(Array(saltByte),
    * rowKeyPart2.getBytes)` (Utils.scala:62-64, salt arithmetic
    * :82-96). The string model used everywhere else in this library
    * carries salt as a column instead (documented deviation); this codec
    * closes the gap for callers that need byte-for-byte HBase key
    * compatibility. */
  def saltedBytes(key: String, buckets: Int = Salt.Buckets): Array[Byte] = {
    val kb = if (key == null) Array.empty[Byte] else key.getBytes("UTF-8")
    Salt.bucket(kb, buckets).toByte +: kb
  }

  /** Inverse of [[saltedBytes]]: (salt, key). Empty input is the
    * degenerate empty-key encoding's prefix — rejected loudly. */
  def fromSaltedBytes(bytes: Array[Byte]): (Int, String) = {
    require(bytes != null && bytes.nonEmpty, "salted rowkey needs >= 1 byte")
    (bytes(0).toInt, new String(bytes, 1, bytes.length - 1, "UTF-8"))
  }
}

/** Packed-cell codec: a cell value is `<n>\0<v1>\n<v2>\n…\n<vn>` where n is
  * the number of packed rows (Utils.scala:56) and each vi is a \0-joined
  * measure tuple (Utils.scala:203-211). Values are sorted before packing
  * (the reference sorts by qualifier then relies on input order within a
  * qualifier; we sort values for determinism — SURVEY.md §5).
  */
object Cell {
  def pack(values: Seq[String]): String =
    values.length.toString + Delims.Delim + values.mkString(Delims.RowSep)

  /** Inverse of pack: strip the `n\0` count prefix (Utils.scala:325-326),
    * split the remainder on `\n`. Returns (count, values). */
  def unpack(cell: String): (Int, Seq[String]) = {
    val i = cell.indexOf(Delims.Delim)
    require(i >= 0, s"not a packed cell (no count prefix): $cell")
    val n = cell.substring(0, i).toInt
    val body = cell.substring(i + 1)
    val vals = if (body.isEmpty && n == 0) Seq.empty
               else Splits.keepTrailing(body, Delims.RowSep).toSeq
    (n, vals)
  }
}

object Splits {
  /** Split preserving trailing empty fields — the semantics the reference
    * hand-rolled (Utils.scala:853-876) because Java/Scala `split` drops
    * trailing empties. Equivalent to `String.split(sep, -1)` for literal
    * (non-regex) separators.
    */
  def keepTrailing(s: String, sep: String): Array[String] = {
    // indexOf("", start) returns start, so an empty separator would spin
    // the loop forever appending "" — fail the misuse loudly instead
    require(sep != null && sep.nonEmpty, "separator must be non-empty")
    if (s == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var idx = s.indexOf(sep, start)
    while (idx >= 0) {
      out += s.substring(start, idx)
      start = idx + sep.length
      idx = s.indexOf(sep, start)
    }
    out += s.substring(start)
    out.toArray
  }
}

/** Minimal JSON string escaper shared by the Bench and Verify mains —
  * one implementation, so an escape-class fix reaches both artifact
  * writers (two hand-rolled copies had already drifted on which escape
  * form newlines took). Escapes backslash, quote, and ALL control chars
  * below 0x20; a tab or CR in builder-authored SQL must not break the
  * driver's json.load. */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
