package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sitemaps.org XML kernels — the step after [[RobotsKernels]] extracts
  * Sitemap URLs: parsing the sitemap DOCUMENTS themselves into crawl
  * frontier rows. Two document shapes share one entry schema:
  * `<urlset>` children (`<url><loc/><lastmod/></url>`, is_index=false —
  * page URLs to fetch) and `<sitemapindex>` children
  * (`<sitemap><loc/><lastmod/></sitemap>`, is_index=true — one level of
  * nesting: child sitemap URLs to fetch-and-parse next).
  *
  * TOTAL like every web kernel here: a single forward scan, ASCII
  * case-insensitive tag matching, `<loc>` content entity-decoded
  * (XML's five + numeric) or CDATA-unwrapped, whitespace-trimmed per
  * the sitemaps.org note. Malformed input degrades, never throws: a
  * block without a parseable non-empty `<loc>` emits nothing, an
  * unterminated block extends to the next block (or EOF) best-effort,
  * foreign bytes yield zero entries. `<lastmod>` is carried verbatim
  * (trimmed) and nullable — W3C datetime validation is the consumer's
  * typed cast, not the parser's job. */
object SitemapKernels {

  /** ASCII case-insensitive `<name` open tag at/after `from`, where the
    * name is followed by '>', '/', or whitespace (so `<url` never
    * matches `<urlset`, `<sitemap` never `<sitemapindex`); -1 if none. */
  private def openTag(s: String, from: Int, name: String): Int = {
    val n = s.length
    var i = from
    while (i + 1 + name.length <= n) {
      if (s.charAt(i) == '<' &&
          s.regionMatches(true, i + 1, name, 0, name.length)) {
        val after = i + 1 + name.length
        if (after >= n) return -1 // "<loc" at EOF: no content possible
        val c = s.charAt(after)
        if (c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\n' ||
          c == '\r') return i
      }
      i += 1
    }
    -1
  }

  /** `</name` close tag with the SAME name-delimiter guard as
    * [[openTag]]: the name must be followed by '>', whitespace, or
    * end-of-input — so `</location>` never closes `<loc>` and
    * `</urlset>` never closes `<url>` in sitemaps using extension
    * tags that share a prefix. */
  private def closeTag(s: String, from: Int, name: String): Int = {
    val n = s.length
    var i = from
    while (i + 2 + name.length <= n) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '/' &&
          s.regionMatches(true, i + 2, name, 0, name.length)) {
        val after = i + 2 + name.length
        if (after >= n) return i
        val c = s.charAt(after)
        if (c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r')
          return i
      }
      i += 1
    }
    -1
  }

  /** XML entity decode (amp/lt/gt/quot/apos + numeric); unrecognized
    * '&' stays literal. */
  private def decodeXml(t: String): String = {
    if (t.indexOf('&') < 0) return t
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = t.indexOf(';', i + 1)
        var decoded: String = null
        if (semi > 0 && semi - i <= 12) {
          val body = t.substring(i + 1, semi)
          decoded = body match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ =>
              if (body.length >= 2 && body.charAt(0) == '#') {
                val (d, r) =
                  if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
                    (body.substring(2), 16) else (body.substring(1), 10)
                try {
                  val cp = Integer.parseInt(d, r)
                  if (Character.isValidCodePoint(cp) && cp > 0)
                    new String(Character.toChars(cp))
                  else null
                } catch { case _: NumberFormatException => null }
              } else null
          }
        }
        if (decoded == null) { sb.append(c); i += 1 }
        else { sb.append(decoded); i = semi + 1 }
      }
    }
    sb.toString
  }

  /** Decoded, trimmed content of the first `<name>…</name>` inside
    * `s[from, until)`, CDATA-unwrapped; null when absent/empty. */
  private def innerText(s: String, from: Int, until: Int,
                        name: String): String = {
    val at = openTag(s, from, name)
    if (at < 0 || at >= until) return null
    val gt = s.indexOf('>', at)
    if (gt < 0 || gt >= until) return null
    if (gt > at && s.charAt(gt - 1) == '/') return null // self-closed
    val end = closeTag(s, gt + 1, name)
    val stop = if (end < 0 || end > until) until else end
    var body = s.substring(gt + 1, stop).trim
    if (body.startsWith("<![CDATA[")) {
      val cd = body.indexOf("]]>")
      body = (if (cd >= 0) body.substring(9, cd) else body.substring(9)).trim
    } else body = decodeXml(body).trim
    if (body.isEmpty) null else body
  }

  /** All sitemap entries of a document: (loc, lastmod|null, isIndex),
    * document order. */
  def parse(xml: String): Seq[(String, String, Boolean)] = {
    if (xml == null) return Seq.empty
    val out = Seq.newBuilder[(String, String, Boolean)]
    val n = xml.length
    var i = 0
    var steps = 0
    while (i < n && steps < (1 << 20)) { // hard loop bound: total on any input
      steps += 1
      val u = openTag(xml, i, "url")
      val m = openTag(xml, i, "sitemap")
      val (at, tag, isIdx) =
        if (u < 0 && m < 0) (-1, "", false)
        else if (m < 0 || (u >= 0 && u < m)) (u, "url", false)
        else (m, "sitemap", true)
      if (at < 0) i = n
      else {
        val gt = xml.indexOf('>', at)
        if (gt < 0) i = n
        else {
          val close = closeTag(xml, gt + 1, tag)
          // unterminated block: extend to the NEXT block start (or EOF)
          val nextU = openTag(xml, gt + 1, "url")
          val nextM = openTag(xml, gt + 1, "sitemap")
          val nextAny = (nextU, nextM) match {
            case (-1, -1) => n
            case (-1, b) => b
            case (a, -1) => a
            case (a, b) => math.min(a, b)
          }
          val end = if (close >= 0 && close <= nextAny) close else nextAny
          val loc = innerText(xml, gt + 1, end, "loc")
          val lastmod = innerText(xml, gt + 1, end, "lastmod")
          if (loc != null) out += ((loc, lastmod, isIdx))
          i = math.max(end, gt + 1)
          if (close >= 0 && close == end) i = close + 3 + tag.length
        }
      }
    }
    out.result()
  }

  def entriesOf(xml: UTF8String): GenericArrayData =
    new GenericArrayData(parse(xml.toString).map { case (loc, lm, idx) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(loc),
          if (lm == null) null else UTF8String.fromString(lm),
          idx))
    }.toArray[Any])
}

case class SitemapEntriesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("is_index", BooleanType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "sitemap_entries"
  override def nullSafeEval(in: Any): Any =
    SitemapKernels.entriesOf(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.SitemapKernels.entriesOf($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SitemapExprs {
  /** All `<url>`/`<sitemap>` entries of a sitemap XML document. */
  def sitemapEntries(xml: Column): Column =
    ColumnBridge.column(SitemapEntriesExpr(ColumnBridge.expression(xml)))
}
