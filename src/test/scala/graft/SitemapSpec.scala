package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SitemapKernels

/** sitemaps.org parsing: urlset vs sitemapindex entries, entity/CDATA
  * loc decoding, decoys, and graceful degradation on malformed XML. */
class SitemapSpec extends AnyFunSuite {

  private def p(xml: String): Seq[(String, String, Boolean)] =
    SitemapKernels.parse(xml)

  test("urlset: loc + optional lastmod, document order, decoys skipped") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url><loc>https://a.example/p?x=1&amp;y=2</loc>
        |      <lastmod>2024-03-05</lastmod></url>
        | <url><loc><![CDATA[https://a.example/cdata&raw]]></loc></url>
        | <url><lastmod>2024-01-01</lastmod></url>
        | <url><loc>   </loc></url>
        | <URL><LOC> https://a.example/upper </LOC></URL>
        |</urlset>""".stripMargin
    assert(p(xml) === Seq(
      ("https://a.example/p?x=1&y=2", "2024-03-05", false),
      ("https://a.example/cdata&raw", null, false),
      ("https://a.example/upper", null, false)))
  }

  test("sitemapindex: one level of nesting, is_index=true") {
    val xml =
      """<sitemapindex>
        | <sitemap><loc>https://a.example/sm-1.xml</loc>
        |          <lastmod>2024-02-02T10:00:00Z</lastmod></sitemap>
        | <sitemap><loc>https://a.example/sm-2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(p(xml) === Seq(
      ("https://a.example/sm-1.xml", "2024-02-02T10:00:00Z", true),
      ("https://a.example/sm-2.xml", null, true)))
  }

  test("malformed XML degrades, never throws") {
    // unterminated final block: best-effort to EOF
    assert(p("<urlset><url><loc>https://t.example/x</loc>") ===
      Seq(("https://t.example/x", null, false)))
    // unterminated FIRST block stops at the next block's start
    assert(p("<url><loc>https://t.example/1</loc>" +
      "<url><loc>https://t.example/2</loc></url>") ===
      Seq(("https://t.example/1", null, false),
        ("https://t.example/2", null, false)))
    // foreign bytes / html / empty → zero entries
    assert(p("<html><body>not a sitemap</body></html>") === Seq.empty)
    assert(p("") === Seq.empty)
    assert(p(null) === Seq.empty)
    // "<urlset" must NOT parse as a "<url" block ("<sitemapindex" ditto)
    assert(p("<urlset><loc>https://no.example/</loc></urlset>") === Seq.empty)
    // self-closed loc carries no content
    assert(p("<url><loc/></url>") === Seq.empty)
  }

  test("close tags with a shared-prefix name never close the target") {
    // </location> must NOT close <loc>: the extension tag's text is
    // not the loc value, and the REAL </loc> still terminates it
    assert(p("<url><loc>https://t.example/a</loc>" +
      "<location>ignored</location></url>") ===
      Seq(("https://t.example/a", null, false)))
    // a sitemap whose <loc> is (malformedly) followed by </location>
    // first: the loc runs to the real close, swallowing the junk —
    // degraded content, but no throw and no early truncation
    assert(p("<url><loc>https://t.example/b</location></loc></url>") ===
      Seq(("https://t.example/b</location>", null, false)))
    // </urlset> never closes an open <url> block early (best-effort
    // content to the real close still parses)
    assert(p("<urlset><url><loc>https://t.example/c</loc></url></urlset>" +
      "<url><loc>https://t.example/d</loc></url>") ===
      Seq(("https://t.example/c", null, false),
        ("https://t.example/d", null, false)))
    // whitespace before '>' in the close tag is a valid delimiter
    assert(p("<url><loc>https://t.example/e</loc ></url>") ===
      Seq(("https://t.example/e", null, false)))
  }

  test("SQL surface: sitemap_entries registered and struct-shaped") {
    val spark = SparkTestSession.spark
    graft.ops.GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT inline(sitemap_entries(
        |  '<urlset><url><loc>https://q.example/1</loc>' ||
        |  '<lastmod>2024-06-01</lastmod></url></urlset>'))""".stripMargin)
      .collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "https://q.example/1")
    assert(rows(0).getString(1) === "2024-06-01")
    assert(rows(0).getBoolean(2) === false)
  }
}
