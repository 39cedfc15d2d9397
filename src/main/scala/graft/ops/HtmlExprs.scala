package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM HTML→text extraction and URL canonicalization kernels — the
  * two transforms between the WARC parse ([[graft.ingest.Warc]]) and the
  * text-curation operators in a web-crawl training pipeline. Single-pass
  * walkers packaged as codegen kernels ([[KernelUnaryExpression]]):
  * one static call per row inside whole-stage codegen.
  *
  * [[HtmlKernels.extractText]] contract (deterministic, so gates can
  * recompute expected output from the synthesis formula):
  *  - comments (`<!-- -->`), doctype/PI tags, and the RAW-TEXT elements
  *    `script`/`style`/`title`/`noscript` are dropped whole;
  *  - block-level tags (open or close: p, div, br, h1-h6, li, tr, td,
  *    table, pre, blockquote, section, article, header, footer, nav,
  *    aside, main, form, hr, ul, ol, dl, dt, dd, thead, tbody, tfoot,
  *    th, figure, figcaption, address, center, html, head, body) end
  *    the current text block; all other tags vanish;
  *  - named entities amp/lt/gt/quot/apos decode, nbsp decodes to a
  *    plain space, numeric `&#N;` / `&#xH;` decode as code points; an
  *    unrecognized `&…` stays literal;
  *  - within a block, runs of ASCII whitespace (TAB LF FF CR SPACE —
  *    the WHATWG set, deliberately NOT unicode-aware so both engines
  *    of the oracle agree) collapse to one space and the block trims;
  *  - non-empty blocks join with `\n`.
  *
  * A tag scan is quote-aware (`<a href="x>y">` does not end at the
  * quoted `>`), and every walker is total: unterminated constructs
  * consume to end-of-input rather than throwing.
  */
object HtmlKernels {

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "p", "div", "br", "hr",
      "h1", "h2", "h3", "h4", "h5", "h6",
      "ul", "ol", "li", "dl", "dt", "dd",
      "table", "thead", "tbody", "tfoot", "tr", "td", "th",
      "blockquote", "pre", "section", "article", "header", "footer",
      "nav", "aside", "main", "figure", "figcaption", "form",
      "address", "center").foreach(s.add)
    s
  }

  private val RawTextTags = Set("script", "style", "title", "noscript")

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Collapse ASCII-whitespace runs to single spaces and trim. */
  private def normalizeBlock(sb: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(sb.length)
    var i = 0
    var pendingSpace = false
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (isAsciiWs(c)) { if (out.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Index just past the tag's closing '>', skipping quoted attribute
    * values; `html.length` when unterminated. `from` points at '<'. */
  private def tagEnd(html: String, from: Int): Int = {
    var i = from + 1
    var quote: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    html.length
  }

  /** Lowercase tag name at a '<' (after an optional '/'); "" when the
    * '<' does not open a tag. */
  private def tagNameAt(html: String, from: Int): String = {
    var i = from + 1
    if (i < html.length && html.charAt(i) == '/') i += 1
    val start = i
    while (i < html.length && {
      val c = html.charAt(i)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9')
    }) i += 1
    if (i == start) "" else html.substring(start, i).toLowerCase
  }

  /** Decode the entity starting at '&'; returns (decoded, next index)
    * or null when not a recognized entity (the '&' stays literal). */
  private def entityAt(html: String, from: Int): (String, Int) = {
    val semi = html.indexOf(';', from + 1)
    if (semi < 0 || semi - from > 12) return null
    val body = html.substring(from + 1, semi)
    val decoded = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ =>
        if (body.length >= 2 && body.charAt(0) == '#') {
          val (digits, radix) =
            if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
              (body.substring(2), 16) else (body.substring(1), 10)
          try {
            val cp = Integer.parseInt(digits, radix)
            if (Character.isValidCodePoint(cp) && cp > 0)
              new String(Character.toChars(cp))
            else null
          } catch { case _: NumberFormatException => null }
        } else null
    }
    if (decoded == null) null else (decoded, semi + 1)
  }

  /** Index of the `</name` close tag (ASCII case-insensitive, name
    * followed by '>', '/', or whitespace per the HTML raw-text rule)
    * at/after `from`; -1 when unterminated. In-place scan — no
    * lowercased copy of the document per raw-text element. */
  private def rawTextClose(html: String, from: Int, name: String): Int = {
    val n = html.length
    var i = from
    while (i + 2 + name.length <= n) {
      if (html.charAt(i) == '<' && html.charAt(i + 1) == '/' &&
          html.regionMatches(true, i + 2, name, 0, name.length)) {
        val after = i + 2 + name.length
        if (after >= n) return i
        val c = html.charAt(after)
        if (c == '>' || c == '/' || isAsciiWs(c)) return i
      }
      i += 1
    }
    -1
  }

  /** The shared walker — ONE pass producing the normalized text of
    * every non-empty block TOGETHER with that block's anchor-only text
    * (text inside `<a>` elements, same normalization). Every public
    * signal assembles from this: full extract (join texts), link
    * density (cps totals), main text (drop high-link blocks). The
    * crawl hot path asks for several signals per page; independent
    * walks would multiply the per-row cost. */
  private def walkBlocks(
      html: String): scala.collection.mutable.ArrayBuffer[(String, String)] = {
    val blocks = new scala.collection.mutable.ArrayBuffer[(String, String)]
    val cur = new java.lang.StringBuilder
    val aCur = new java.lang.StringBuilder
    var anchorDepth = 0
    def flush(): Unit = {
      val t = normalizeBlock(cur)
      val a = normalizeBlock(aCur)
      cur.setLength(0); aCur.setLength(0)
      if (t.nonEmpty) blocks += ((t, a))
    }
    def emit(txt: String): Unit = {
      cur.append(txt)
      if (anchorDepth > 0) aCur.append(txt)
    }
    def emitChar(c: Char): Unit = {
      cur.append(c)
      if (anchorDepth > 0) aCur.append(c)
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n &&
            (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          i = tagEnd(html, i) // doctype / processing instruction
        } else {
          val name = tagNameAt(html, i)
          if (name.isEmpty) { emitChar(c); i += 1 } // literal '<'
          else {
            val isClose = html.charAt(i + 1) == '/'
            val afterTag = tagEnd(html, i)
            if (!isClose && RawTextTags.contains(name)) {
              // raw-text element: drop content to its matching close tag
              val close = rawTextClose(html, afterTag, name)
              i = if (close < 0) n else tagEnd(html, close)
            } else {
              if (BlockTags.contains(name)) flush()
              if (name == "a") {
                if (isClose) { if (anchorDepth > 0) anchorDepth -= 1 }
                else anchorDepth += 1
              }
              i = afterTag
            }
          }
        }
      } else if (c == '&') {
        val e = entityAt(html, i)
        if (e == null) { emitChar('&'); i += 1 }
        else { emit(e._1); i = e._2 }
      } else {
        emitChar(c)
        i += 1
      }
    }
    flush()
    blocks
  }

  private def cps(s: String): Long =
    s.codePointCount(0, s.length).toLong

  private def joinBlocks(
      blocks: scala.collection.Seq[(String, String)]): String = {
    val sb = new java.lang.StringBuilder
    blocks.foreach { case (t, _) =>
      if (sb.length > 0) sb.append('\n')
      sb.append(t)
    }
    sb.toString
  }

  private def ppmOf(blocks: scala.collection.Seq[(String, String)]): Long = {
    // the ratio is over the JOINED extract (block-separating newlines
    // count in the denominator, matching length(extract) in the oracle)
    var total = 0L
    var anchor = 0L
    blocks.foreach { case (t, a) => total += cps(t) + 1; anchor += cps(a) }
    if (blocks.isEmpty) 0L else anchor * 1000000L / (total - 1)
  }

  def extractText(html: UTF8String): UTF8String =
    UTF8String.fromString(joinBlocks(walkBlocks(html.toString)))

  /** Link-density boilerplate signal: ppm of the EXTRACTED text that
    * sits inside `<a>` elements (floor((1e6 × anchor chars) / total
    * chars); 0 for an empty extract). Chars are Unicode CODE POINTS —
    * the unit both engines' `length()` counts — not UTF-16 units, so
    * astral-plane text cannot skew the ratio. Integer ppm by the
    * repo's dialect-safety discipline — no doubles cross an oracle. */
  def linkTextPpm(html: UTF8String): Long =
    ppmOf(walkBlocks(html.toString))

  /** Both signals from ONE walk, as an InternalRow for the struct
    * expression ([[HtmlExtractStatsExpr]]) the pipelines should prefer:
    * separate `html_extract` + `html_link_ppm` projections cannot share
    * the walk across expression trees, the struct form can. */
  def extractStats(
      html: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val blocks = walkBlocks(html.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(joinBlocks(blocks)), ppmOf(blocks)))
  }

  /** Attribute map of the tag opening at `from` ('<'): lowercase names,
    * quoted or bare values, valueless attrs map to "". Total — an
    * unterminated tag yields the attrs seen so far. */
  private def tagAttrs(html: String, from: Int): Map[String, String] = {
    val end = tagEnd(html, from) - 1 // index of '>' (or n-1 when unterminated)
    var i = from + 1
    // skip the (optional '/') tag name
    if (i < end && html.charAt(i) == '/') i += 1
    while (i < end && !isAsciiWs(html.charAt(i))) i += 1
    var attrs = Map.empty[String, String]
    while (i < end) {
      while (i < end && (isAsciiWs(html.charAt(i)) || html.charAt(i) == '/'))
        i += 1
      val nameStart = i
      while (i < end && html.charAt(i) != '=' && html.charAt(i) != '/' &&
        !isAsciiWs(html.charAt(i))) i += 1
      val name = html.substring(nameStart, i).toLowerCase
      if (name.isEmpty) i += 1
      else {
        while (i < end && isAsciiWs(html.charAt(i))) i += 1
        var value = ""
        if (i < end && html.charAt(i) == '=') {
          i += 1
          while (i < end && isAsciiWs(html.charAt(i))) i += 1
          if (i < end && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i)
            val vStart = i + 1
            i += 1
            while (i < end && html.charAt(i) != q) i += 1
            value = html.substring(vStart, i)
            if (i < end) i += 1
          } else {
            val vStart = i
            while (i < end && !isAsciiWs(html.charAt(i))) i += 1
            value = html.substring(vStart, i)
          }
        }
        if (!attrs.contains(name)) attrs += (name -> value)
      }
    }
    attrs
  }

  /** Document metadata the TEXT extractor deliberately drops but crawl
    * curation wants: `<title>` text (whitespace-normalized, entities
    * decoded), the `<html lang>` attribute (a language-id prior), the
    * `rel=canonical` link href (the page's own dedup key), and the
    * `meta name=description` content. First occurrence of each wins;
    * absent → null. One pass, total on malformed markup. */
  def metaOf(html: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = html.toString
    var title: String = null
    var lang: String = null
    var canonical: String = null
    var description: String = null
    val n = s.length
    var i = 0
    while (i < n &&
        (title == null || lang == null || canonical == null ||
          description == null)) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
        } else {
          val name = tagNameAt(s, i)
          val isClose = i + 1 < n && s.charAt(i + 1) == '/'
          if (name.isEmpty) i += 1
          else if (!isClose && name == "title" && title == null) {
            val after = tagEnd(s, i)
            val close = rawTextClose(s, after, "title")
            val raw = s.substring(after, if (close < 0) n else close)
            // normalize exactly like a text block: entities + ASCII-ws
            val sb = new java.lang.StringBuilder
            var j = 0
            while (j < raw.length) {
              if (raw.charAt(j) == '&') {
                val e = entityAt(raw, j)
                if (e == null) { sb.append('&'); j += 1 }
                else { sb.append(e._1); j = e._2 }
              } else { sb.append(raw.charAt(j)); j += 1 }
            }
            title = normalizeBlock(sb)
            i = if (close < 0) n else tagEnd(s, close)
          } else if (!isClose && RawTextTags.contains(name)) {
            // script/style/noscript bodies (and any repeated <title>)
            // are raw text — a '<link rel=canonical>' template string
            // inside a JS literal must not set page metadata (the same
            // skip extractText applies)
            val close = rawTextClose(s, tagEnd(s, i), name)
            i = if (close < 0) n else tagEnd(s, close)
          } else {
            if (!isClose) {
              if (name == "html" && lang == null)
                tagAttrs(s, i).get("lang").filter(_.nonEmpty)
                  .foreach(lang = _)
              else if (name == "link" && canonical == null) {
                val a = tagAttrs(s, i)
                if (a.get("rel").exists(_.equalsIgnoreCase("canonical")))
                  a.get("href").filter(_.nonEmpty).foreach(canonical = _)
              } else if (name == "meta" && description == null) {
                val a = tagAttrs(s, i)
                if (a.get("name").exists(_.equalsIgnoreCase("description")))
                  a.get("content").foreach(description = _)
              }
            }
            i = tagEnd(s, i)
          }
        }
      } else i += 1
    }
    def u(x: String): UTF8String =
      if (x == null) null else UTF8String.fromString(x)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](u(title), u(lang), u(canonical), u(description)))
  }

  /** All `<a href>` values of a page, in document order (duplicates
    * kept — edge multiplicity is signal) — the link-graph emitter
    * feeding [[graft.ops.GraphOps.pageRankFixedPoint]]. Quote-aware,
    * total; empty/missing hrefs skip. */
  def hrefs(html: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = html.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
        } else {
          val name = tagNameAt(s, i)
          val isClose = i + 1 < n && s.charAt(i + 1) == '/'
          if (name.isEmpty) i += 1
          else if (!isClose && RawTextTags.contains(name)) {
            // same raw-text rule as extractText: tag-like text inside
            // a script/style body (document.write('<a href=...>')) is
            // content, not markup — emitting it would fabricate
            // link-graph edges
            val close = rawTextClose(s, tagEnd(s, i), name)
            i = if (close < 0) n else tagEnd(s, close)
          } else {
            if (name == "a" && !isClose) {
              tagAttrs(s, i).get("href").filter(_.nonEmpty)
                .foreach(h => out += UTF8String.fromString(h))
            }
            i = tagEnd(s, i)
          }
        }
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** (href, anchor text) pairs in CLOSE order — the retrieval-training
    * signal [[hrefs]] drops: anchor text is the linking page's
    * description of the target (query-document pairs for ranking
    * data). Text is everything between the anchor's open and matching
    * close (nested markup stripped, entities decoded, ASCII-ws
    * collapsed — the [[extractText]] normalization), raw-text bodies
    * skipped. Nested anchors each collect their own span (the inner
    * closes first); hrefless anchors collect nothing; unterminated
    * anchors at end-of-input emit what they gathered (total). */
  def hrefTexts(
      html: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = html.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    // open-anchor stack: (href or null, text collector)
    val stack =
      scala.collection.mutable.ArrayBuffer.empty[(String, java.lang.StringBuilder)]
    def emitStr(t: String): Unit = {
      var k = 0
      while (k < stack.length) { stack(k)._2.append(t); k += 1 }
    }
    def emitChar(c: Char): Unit = {
      var k = 0
      while (k < stack.length) { stack(k)._2.append(c); k += 1 }
    }
    def close(): Unit = {
      val (href, sb) = stack.remove(stack.length - 1)
      if (href != null)
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(href),
            UTF8String.fromString(normalizeBlock(sb))))
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
            (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          i = tagEnd(s, i)
        } else {
          val name = tagNameAt(s, i)
          val isClose = i + 1 < n && s.charAt(i + 1) == '/'
          if (name.isEmpty) { emitChar('<'); i += 1 }
          else if (!isClose && RawTextTags.contains(name)) {
            val cl = rawTextClose(s, tagEnd(s, i), name)
            i = if (cl < 0) n else tagEnd(s, cl)
          } else {
            if (name == "a") {
              if (isClose) { if (stack.nonEmpty) close() }
              else stack += ((tagAttrs(s, i).get("href")
                .filter(_.nonEmpty).orNull, new java.lang.StringBuilder))
            } else if (stack.nonEmpty && BlockTags.contains(name)) {
              emitChar(' ') // a block boundary inside an anchor is a gap
            }
            i = tagEnd(s, i)
          }
        }
      } else if (c == '&') {
        val e = entityAt(s, i)
        if (e == null) { emitChar('&'); i += 1 }
        else { emitStr(e._1); i = e._2 }
      } else {
        emitChar(c)
        i += 1
      }
    }
    while (stack.nonEmpty) close() // unterminated anchors stay total
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Charset-honoring HTTP body decode (see [[CharsetDecodeExpr]]):
    * charset= parsed from the Content-Type header value; unknown or
    * absent → UTF-8; malformed bytes always REPLACE to U+FFFD. */
  private val CharsetParam = java.util.regex.Pattern
    .compile("(?i)charset\\s*=\\s*\"?([\\w.:+-]+)\"?")

  def charsetDecode(contentType: UTF8String, body: Array[Byte]): UTF8String = {
    val ct = if (contentType == null) "" else contentType.toString
    val m = CharsetParam.matcher(ct)
    val cs =
      if (m.find()) {
        try java.nio.charset.Charset.forName(m.group(1))
        catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
      } else java.nio.charset.StandardCharsets.UTF_8
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    UTF8String.fromString(
      dec.decode(java.nio.ByteBuffer.wrap(body)).toString)
  }

  /** MAIN-content extraction — the boilerplate REMOVAL step beyond tag
    * stripping: blocks whose anchor share exceeds `maxLinkPpm` drop
    * whole (nav bars, footers, link farms, "related articles" lists —
    * the jusText/trafilatura link-density heuristic). A block with
    * anchor_cps × 10⁶ > maxLinkPpm × text_cps is boilerplate; the
    * survivors join with `\n` exactly like [[extractText]]. */
  def mainText(html: UTF8String, maxLinkPpm: Int): UTF8String = {
    val kept = walkBlocks(html.toString).filter { case (t, a) =>
      cps(a) * 1000000L <= maxLinkPpm.toLong * cps(t)
    }
    UTF8String.fromString(joinBlocks(kept))
  }
}

/** Canonical-URL kernel for URL-level crawl dedup: one deterministic
  * string form per "same page" URL spelling. Contract (each step is a
  * published canonicalization convention; the gate oracle recomputes
  * the expected output from its synthesis formula, so the exact rule
  * set is pinned):
  *  - scheme and host lowercase; userinfo dropped; one trailing host
  *    dot dropped;
  *  - default ports stripped (http:80, https:443), as is a bare ':';
  *  - empty path becomes '/';
  *  - fragment dropped;
  *  - query: empty params drop, tracking params drop (name starts
  *    with `utm_`, or is one of fbclid, gclid, msclkid, mc_eid, ref,
  *    ref_src, igshid, spm), survivors sort by the byte order of the
  *    WHOLE `name=value` string (so `a+b=1` orders by the '+' byte,
  *    not by a (name, value) tuple — the gate oracle pins this exact
  *    ordering) and rejoin; an emptied query drops its '?'.
  * A string with no "://" is returned unchanged (total — a relative
  * or garbage URL classifies downstream, never throws).
  */
object UrlKernels {

  private val TrackingNames = Set("fbclid", "gclid", "msclkid", "mc_eid",
    "ref", "ref_src", "igshid", "spm")

  private def isTracking(name: String): Boolean =
    name.startsWith("utm_") || TrackingNames.contains(name)

  def normalizeUrl(url: UTF8String): UTF8String = {
    val s = url.toString
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return url
    val scheme = s.substring(0, schemeEnd).toLowerCase
    val rest = s.substring(schemeEnd + 3)
    var authEnd = rest.length
    var k = 0
    while (k < rest.length && authEnd == rest.length) {
      val c = rest.charAt(k)
      if (c == '/' || c == '?' || c == '#') authEnd = k
      k += 1
    }
    var auth = rest.substring(0, authEnd)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    // a port colon must sit AFTER any bracketed IPv6 literal — the
    // colons inside [::1] are host chars, not a port separator
    val colon = auth.lastIndexOf(':')
    val portColon = if (colon > auth.lastIndexOf(']')) colon else -1
    var (host, port) =
      if (portColon >= 0)
        (auth.substring(0, portColon), auth.substring(portColon + 1))
      else (auth, "")
    host = host.toLowerCase
    if (host.endsWith(".")) host = host.dropRight(1)
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") &&
      !(scheme == "https" && port == "443")

    val tail = rest.substring(authEnd)
    val hashAt = tail.indexOf('#')
    val noFrag = if (hashAt < 0) tail else tail.substring(0, hashAt)
    val qAt = noFrag.indexOf('?')
    val path0 = if (qAt < 0) noFrag else noFrag.substring(0, qAt)
    val path = if (path0.isEmpty) "/" else path0
    val query =
      if (qAt < 0) ""
      else {
        val kept = noFrag.substring(qAt + 1).split("&", -1).toSeq
          .filter(_.nonEmpty)
          .filter { p =>
            val eq = p.indexOf('=')
            val name = if (eq < 0) p else p.substring(0, eq)
            !isTracking(name)
          }
          .sorted
        if (kept.isEmpty) "" else "?" + kept.mkString("&")
      }
    UTF8String.fromString(
      scheme + "://" + host + (if (keepPort) ":" + port else "") +
        path + query)
  }

  /** Resolve a reference (an HTTP `Location` header, an href) against
    * a base URL — RFC 3986 §5-lite, TOTAL: absolute refs pass through,
    * `//host/…` takes the base scheme, `/path` the base origin,
    * `?query` the base path, `#frag` resolves to the base resource
    * (fragments never reach a server), and relative paths merge with
    * the base path's directory with dot-segment removal (`.`/`..`,
    * never popping above root; a trailing `/.` or `/..` keeps its
    * directory slash). Null when neither side yields an absolute URL
    * (null/`://`-less base with a relative ref, null ref, or a
    * non-hierarchical-scheme ref — `mailto:`, `javascript:`, `tel:`
    * and friends never name a fetchable resource). A ref has a scheme
    * iff it matches RFC 3986 `ALPHA *( ALPHA / DIGIT / "+" / "-" /
    * "." ) ":"` before any `/?#` — so `/out?next=https://x.com` is
    * correctly treated as relative. The result
    * is NOT normalized — feed it [[normalizeUrl]]. */
  def resolveUrl(base: UTF8String, ref0: UTF8String): UTF8String = {
    if (ref0 == null) return null
    val ref = ref0.toString.trim
    val sl = schemeLen(ref)
    if (sl > 0) {
      // Scheme present: hierarchical (scheme://) passes through;
      // non-hierarchical (mailto:, javascript:, tel:, data:) is not a
      // link target — null, never path-merged into the base.
      return if (ref.startsWith("//", sl)) UTF8String.fromString(ref)
      else null
    }
    if (base == null) return null
    val b = base.toString
    val schemeEnd = b.indexOf("://")
    if (schemeEnd <= 0) return null
    if (ref.isEmpty) return base
    val scheme = b.substring(0, schemeEnd)
    if (ref.startsWith("//")) return UTF8String.fromString(scheme + ":" + ref)
    val rest = b.substring(schemeEnd + 3)
    var authEnd = rest.length
    var k = 0
    while (k < rest.length && authEnd == rest.length) {
      val c = rest.charAt(k)
      if (c == '/' || c == '?' || c == '#') authEnd = k
      k += 1
    }
    val origin = scheme + "://" + rest.substring(0, authEnd)
    val tail = rest.substring(authEnd)
    var cut = tail.length
    val qAt = tail.indexOf('?'); if (qAt >= 0) cut = qAt
    val hAt = tail.indexOf('#'); if (hAt >= 0 && hAt < cut) cut = hAt
    val basePath = { val p = tail.substring(0, cut); if (p.isEmpty) "/" else p }
    if (ref.startsWith("/"))
      return UTF8String.fromString(origin + removeDotSegments(ref))
    if (ref.startsWith("?"))
      return UTF8String.fromString(origin + basePath + ref)
    if (ref.startsWith("#"))
      return UTF8String.fromString(origin + basePath)
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    UTF8String.fromString(
      origin + removeDotSegments(if (dir.isEmpty) "/" + ref else dir + ref))
  }

  /** RFC 3986 §3.1 scheme length (including the `:`), or -1 if the
    * string has no scheme before any `/?#`. */
  private def schemeLen(s: String): Int = {
    if (s.isEmpty) return -1
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return -1
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return i + 1
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return -1 // hit /?# or other delimiter before ':'
      i += 1
    }
    -1
  }

  /** RFC 3986 §5.2.4-lite over the PATH part (query/fragment pass
    * through untouched); `..` never pops above root. */
  private def removeDotSegments(p: String): String = {
    var cut = p.length
    val qAt = p.indexOf('?'); if (qAt >= 0) cut = qAt
    val hAt = p.indexOf('#'); if (hAt >= 0 && hAt < cut) cut = hAt
    val (path, suffix) = (p.substring(0, cut), p.substring(cut))
    if (!path.contains("/.")) return p // fast path: nothing to remove
    val segs = path.split("/", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." => () // skip
        case ".." =>
          // pop, but never the leading "" root marker
          if (out.length > 1 && out.last.nonEmpty) out.remove(out.length - 1)
        case s => out += s
      }
      i += 1
    }
    // "/a/." and "/a/.." name DIRECTORIES: keep the trailing slash
    val last = segs(segs.length - 1)
    if ((last == "." || last == "..") && (out.isEmpty || out.last.nonEmpty))
      out += ""
    val joined = out.mkString("/")
    (if (joined.startsWith("/")) joined else "/" + joined.dropWhile(_ == '/')) +
      suffix
  }

  /** The lowercase host of a URL (post-[[normalizeUrl]] rules), or
    * null for a string with no "://" — the grouping key of per-domain
    * dedup and crawl politeness stats. */
  def urlHost(url: UTF8String): UTF8String = {
    val s = url.toString
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return null
    val rest = s.substring(schemeEnd + 3)
    var authEnd = rest.length
    var k = 0
    while (k < rest.length && authEnd == rest.length) {
      val c = rest.charAt(k)
      if (c == '/' || c == '?' || c == '#') authEnd = k
      k += 1
    }
    var auth = rest.substring(0, authEnd)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    // same bracketed-IPv6 rule as normalizeUrl
    val colon = auth.lastIndexOf(':')
    val portColon = if (colon > auth.lastIndexOf(']')) colon else -1
    var host =
      (if (portColon >= 0) auth.substring(0, portColon) else auth).toLowerCase
    if (host.endsWith(".")) host = host.dropRight(1)
    if (host.isEmpty) null else UTF8String.fromString(host)
  }
}

/** robots.txt (RFC 9309) kernels — the crawl-compliance side of the web
  * surface: retroactive robots filtering is how a dataset audit answers
  * "would this page's robots have allowed the crawl". Scale shape: the
  * robots corpus is a per-HOST dim table — [[robotsRules]] parses each
  * file ONCE on the small side before it broadcasts, and
  * [[robotsAllowed]] evaluates the longest-match rule per URL row in
  * codegen. Parsing per URL row would re-parse a robots file per page.
  *
  * Contract (RFC 9309 semantics, simplified to prefix rules): groups
  * open with consecutive `User-agent:` lines; a group applies if it
  * names the agent exactly (ASCII case-insensitive) or `*`; comments
  * (`#` to EOL) strip; keys are case-insensitive; empty-value
  * `Disallow:` is no rule. Decision: the matching rule with the
  * LONGEST prefix wins; a tie goes to allow; no match → allowed.
  * Total on garbage — unparseable lines are skipped.
  */
object RobotsKernels {

  /** One parsed robots.txt as seen by `userAgent`: the applicable
    * prefix rules, the applicable group's Crawl-delay (milliseconds —
    * the de-facto politeness extension; fractional seconds like `0.5`
    * are common in the wild), and the file-global Sitemap URLs
    * (per-convention independent of any group; document order,
    * duplicates kept). */
  final case class RobotsFile(rules: Seq[(Boolean, String)],
                              crawlDelayMs: Option[Long],
                              sitemaps: Seq[String])

  /** The one walk every robots signal derives from. Group semantics as
    * [[parseRules]] documents; Crawl-delay attaches to its group (a
    * delay in a non-matching agent's group never applies) and the
    * FIRST parseable delay among the chosen groups wins, in file
    * order. Total on garbage — unparseable lines and non-numeric or
    * negative delays skip. */
  def parseAll(content: String, userAgent: String): RobotsFile = {
    final case class Group(agents: Seq[String],
                           rules: Seq[(Boolean, String)],
                           delayMs: Option[Long])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var delay: Option[Long] = None
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer.empty
      rules = scala.collection.mutable.ArrayBuffer.empty
      delay = None
      inRules = false
    }
    content.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush() // a UA line after rules opens a new group
            agents += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" if agents.nonEmpty =>
            inRules = true
            if (value.nonEmpty) rules += ((key == "allow", value))
          case "crawl-delay" if agents.nonEmpty =>
            inRules = true // a delay line sits in the rule block
            if (delay.isEmpty) delay = parseDelayMs(value)
          case "sitemap" =>
            // group-independent per convention; never touches grouping
            if (value.nonEmpty) sitemaps += value
          case _ => () // other unknown keys skip
        }
      }
    }
    flush()
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(_.agents.contains(ua))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    RobotsFile(chosen.flatMap(_.rules).toSeq,
      chosen.flatMap(_.delayMs).headOption, sitemaps.toSeq)
  }

  /** Seconds (decimal allowed) → floor milliseconds; None on anything
    * non-numeric, negative, or absurdly large (> ~24 days). */
  private def parseDelayMs(value: String): Option[Long] =
    try {
      val ms = new java.math.BigDecimal(value)
        .multiply(new java.math.BigDecimal(1000))
      if (ms.signum() < 0 ||
          ms.compareTo(new java.math.BigDecimal(Long.MaxValue / 4096)) > 0)
        None
      else Some(ms.longValue())
    } catch { case _: NumberFormatException => None }

  /** Parse to (allow, prefix) rules for `userAgent`, most-specific
    * group semantics reduced to: rules from every group naming the
    * agent exactly, or — when none does — every `*` group. */
  def parseRules(content: String, userAgent: String): Seq[(Boolean, String)] =
    parseAll(content, userAgent).rules

  /** Longest-match decision for a URL's path+query against parsed
    * rules. The URL's path+query derive with the [[UrlKernels]] rules
    * (empty path → "/", fragment dropped). */
  def isAllowed(url: String, rules: Seq[(Boolean, String)]): Boolean = {
    val schemeEnd = url.indexOf("://")
    val pathQuery =
      if (schemeEnd <= 0) url
      else {
        val rest = url.substring(schemeEnd + 3)
        var k = 0
        var cut = rest.length
        while (k < rest.length && cut == rest.length) {
          val c = rest.charAt(k)
          if (c == '/' || c == '?' || c == '#') cut = k
          k += 1
        }
        val tail = rest.substring(cut)
        val hashAt = tail.indexOf('#')
        val noFrag = if (hashAt < 0) tail else tail.substring(0, hashAt)
        if (noFrag.isEmpty || noFrag.startsWith("?")) "/" + noFrag
        else noFrag
      }
    var bestLen = -1
    var bestAllow = true
    rules.foreach { case (allow, prefix) =>
      if (pathQuery.startsWith(prefix)) {
        if (prefix.length > bestLen ||
          (prefix.length == bestLen && allow && !bestAllow)) {
          bestLen = prefix.length; bestAllow = allow
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  // ── ArrayData bridges for the expressions ──
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def rulesOf(content: UTF8String, ua: UTF8String): GenericArrayData =
    new GenericArrayData(parseRules(content.toString,
        if (ua == null) "*" else ua.toString)
      .map { case (allow, prefix) =>
        new GenericInternalRow(Array[Any](allow,
          UTF8String.fromString(prefix)))
      }.toArray[Any])

  def crawlDelayBoxed(content: UTF8String, ua: UTF8String): java.lang.Long =
    parseAll(content.toString, if (ua == null) "*" else ua.toString)
      .crawlDelayMs.map(java.lang.Long.valueOf).orNull

  def sitemapsOf(content: UTF8String): GenericArrayData =
    new GenericArrayData(parseAll(content.toString, "*").sitemaps
      .map(UTF8String.fromString).toArray[Any])

  def allowed(url: UTF8String, rules: ArrayData): Boolean = {
    val n = rules.numElements()
    val parsed = (0 until n).flatMap { i =>
      if (rules.isNullAt(i)) None
      else {
        val r = rules.getStruct(i, 2)
        val p = r.getUTF8String(1)
        if (p == null) None else Some((r.getBoolean(0), p.toString))
      }
    }
    isAllowed(url.toString, parsed)
  }
}

case class RobotsRulesExpr(child: Expression, userAgent: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("prefix", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "robots_rules"
  override def nullSafeEval(in: Any): Any =
    RobotsKernels.rulesOf(in.asInstanceOf[UTF8String],
      UTF8String.fromString(userAgent))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the UA ships as a reference object — embedding it as a Java
    // string literal would need escaping arbitrary user input
    val ref = ctx.addReferenceObj("ua",
      UTF8String.fromString(userAgent),
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.RobotsKernels.rulesOf($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** The applicable group's Crawl-delay in floor milliseconds; NULL when
  * the file carries none for this agent (distinct from 0 — "no stated
  * delay" and "no delay required" are different politeness answers). */
case class RobotsCrawlDelayExpr(child: Expression, userAgent: String)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay_ms"
  override def nullSafeEval(in: Any): Any =
    RobotsKernels.crawlDelayBoxed(in.asInstanceOf[UTF8String],
      UTF8String.fromString(userAgent))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ua",
      UTF8String.fromString(userAgent),
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long d = graft.ops.RobotsKernels.crawlDelayBoxed($c, $ref);
      if (d == null) { ${ev.isNull} = true; }
      else { ${ev.value} = d.longValue(); }""")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** File-global Sitemap URLs, document order, duplicates kept. */
case class RobotsSitemapsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "robots_sitemaps"
  override def nullSafeEval(in: Any): Any =
    RobotsKernels.sitemapsOf(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.RobotsKernels.sitemapsOf($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class RobotsAllowedExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"
  // left = url (string), right = rules array
  override def nullSafeEval(u: Any, r: Any): Any =
    RobotsKernels.allowed(u.asInstanceOf[UTF8String],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, r) =>
      s"${ev.value} = graft.ops.RobotsKernels.allowed($u, $r);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** See [[HtmlKernels.hrefTexts]] — (href, anchor_text) pairs. */
case class HrefTextsExpr(child: Expression) extends KernelUnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("anchor_text", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "href_texts"
  override def nullSafeEval(in: Any): Any =
    HtmlKernels.hrefTexts(in.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.ops.HtmlKernels.hrefTexts($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class HtmlExtractExpr(child: Expression) extends KernelUnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract"
  override def nullSafeEval(in: Any): Any =
    HtmlKernels.extractText(in.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.ops.HtmlKernels.extractText($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class HtmlLinkPpmExpr(child: Expression) extends KernelUnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "html_link_ppm"
  override def nullSafeEval(in: Any): Any =
    HtmlKernels.linkTextPpm(in.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.ops.HtmlKernels.linkTextPpm($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One-walk struct form of the two HTML signals: (txt, link_ppm). Use
  * this in pipelines that need both — projecting `s.txt` and
  * `s.link_ppm` from one `html_extract_stats(html)` evaluates the walk
  * once (whole-stage subexpression elimination reuses the struct),
  * where the two scalar kernels would each walk the page. */
case class HtmlExtractStatsExpr(child: Expression)
    extends KernelUnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("txt", StringType, nullable = false),
    StructField("link_ppm", LongType, nullable = false)))
  override def prettyName: String = "html_extract_stats"
  override def nullSafeEval(in: Any): Any =
    HtmlKernels.extractStats(in.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.ops.HtmlKernels.extractStats($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class HtmlMainTextExpr(child: Expression, maxLinkPpm: Int)
    extends KernelUnaryExpression {
  require(maxLinkPpm >= 0 && maxLinkPpm <= 1000000,
    s"maxLinkPpm must be a ppm in [0, 1000000], got $maxLinkPpm")
  override def dataType: DataType = StringType
  override def prettyName: String = "html_main_text"
  override def nullSafeEval(in: Any): Any =
    HtmlKernels.mainText(in.asInstanceOf[UTF8String], maxLinkPpm)
  override protected def kernelCall(c: String): String =
    s"graft.ops.HtmlKernels.mainText($c, $maxLinkPpm)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class HtmlMetaExpr(child: Expression) extends KernelUnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("lang_attr", StringType, nullable = true),
    StructField("canonical", StringType, nullable = true),
    StructField("description", StringType, nullable = true)))
  override def prettyName: String = "html_meta"
  override def nullSafeEval(in: Any): Any =
    HtmlKernels.metaOf(in.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.ops.HtmlKernels.metaOf($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-row charset-honoring text decode for HTTP bodies: real crawls
  * are NOT all UTF-8, and `cast(body AS string)` silently mangles a
  * Latin-1 page. Reads `charset=...` from the record's Content-Type
  * (case-insensitive, optional quotes); unknown/absent charsets fall
  * back to UTF-8. Decoding always REPLACES malformed input (a bad byte
  * becomes U+FFFD, never a task failure). */
case class CharsetDecodeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "charset_decode"
  // left = content type (string), right = body (binary)
  override def nullSafeEval(ct: Any, body: Any): Any =
    HtmlKernels.charsetDecode(ct.asInstanceOf[UTF8String],
      body.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ops.HtmlKernels.charsetDecode($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class HrefsExpr(child: Expression) extends KernelUnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "hrefs"
  override def nullSafeEval(in: Any): Any =
    HtmlKernels.hrefs(in.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.ops.HtmlKernels.hrefs($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class UrlNormalizeExpr(child: Expression) extends KernelUnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_normalize"
  override def nullSafeEval(in: Any): Any =
    UrlKernels.normalizeUrl(in.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.ops.UrlKernels.normalizeUrl($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class UrlResolveExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_resolve"
  override def nullable: Boolean = true // null when nothing absolute results
  // left = base URL, right = reference (Location header / href)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    // NOT nullSafeEval: an absolute ref resolves even under a null base
    val b = left.eval(input)
    val r = right.eval(input)
    UrlKernels.resolveUrl(b.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val bc = left.genCode(ctx)
    val rc = right.genCode(ctx)
    val code =
      code"""
         |${bc.code}
         |${rc.code}
         |UTF8String ${ev.value} = graft.ops.UrlKernels.resolveUrl(
         |  ${bc.isNull} ? null : ${bc.value},
         |  ${rc.isNull} ? null : ${rc.value});
         |boolean ${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class UrlHostExpr(child: Expression) extends KernelUnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_host"
  override def nullable: Boolean = true // null for non-URL strings
  override def nullSafeEval(in: Any): Any =
    UrlKernels.urlHost(in.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String =
    s"graft.ops.UrlKernels.urlHost($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column builders — the DataFrame entry points of the HTML/URL ops. */
object HtmlExprs {
  private def e(c: Column): Expression = ColumnBridge.expression(c)
  private def c(x: Expression): Column = ColumnBridge.column(x)

  def htmlExtract(html: Column): Column = c(HtmlExtractExpr(e(html)))
  def htmlLinkPpm(html: Column): Column = c(HtmlLinkPpmExpr(e(html)))

  /** (txt, link_ppm) struct from ONE page walk — prefer in pipelines
    * needing both signals. */
  def htmlExtractStats(html: Column): Column =
    c(HtmlExtractStatsExpr(e(html)))

  /** Main-content extract: blocks above `maxLinkPpm` link density drop
    * whole (nav/footer/link-farm boilerplate). */
  def htmlMainText(html: Column, maxLinkPpm: Int = 500000): Column =
    c(HtmlMainTextExpr(e(html), maxLinkPpm))

  /** (title, lang_attr, canonical, description) struct — the metadata
    * signals text extraction drops. */
  def htmlMeta(html: Column): Column = c(HtmlMetaExpr(e(html)))

  /** Charset-honoring HTTP body decode: `charsetDecode(contentType,
    * body)` — charset= from the header, UTF-8 fallback, REPLACE on
    * malformed bytes. */
  def charsetDecode(contentType: Column, body: Column): Column =
    c(CharsetDecodeExpr(e(contentType), e(body)))

  /** robots.txt rules for a user agent — parse ONCE on the per-host
    * dim side, before it broadcasts. */
  def hrefTexts(html: Column): Column = c(HrefTextsExpr(e(html)))
  def robotsCrawlDelayMs(robotsTxt: Column, userAgent: String = "*"): Column =
    c(RobotsCrawlDelayExpr(e(robotsTxt), userAgent))
  def robotsSitemaps(robotsTxt: Column): Column =
    c(RobotsSitemapsExpr(e(robotsTxt)))
  def robotsRules(robotsTxt: Column, userAgent: String = "*"): Column =
    c(RobotsRulesExpr(e(robotsTxt), userAgent))

  /** RFC 9309 longest-match decision for a URL against parsed rules. */
  def robotsAllowed(url: Column, rules: Column): Column =
    c(RobotsAllowedExpr(e(url), e(rules)))

  /** All `<a href>` values of a page, document order, duplicates kept. */
  def hrefs(html: Column): Column = c(HrefsExpr(e(html)))
  def urlNormalize(url: Column): Column = c(UrlNormalizeExpr(e(url)))
  def urlHost(url: Column): Column = c(UrlHostExpr(e(url)))

  /** Resolve a Location header / href against its page URL (RFC 3986
    * §5-lite, total). */
  def urlResolve(base: Column, ref: Column): Column =
    c(UrlResolveExpr(e(base), e(ref)))
}
