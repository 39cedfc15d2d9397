package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Redirects
import graft.ops.UrlKernels
import org.apache.spark.unsafe.types.UTF8String

/** Redirect-chain resolution: the urlResolve kernel (RFC 3986 §5-lite)
  * and the pointer-doubling chain resolver (bounded hops, cycle-safe). */
class RedirectsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def res(base: String, ref: String): String = {
    val r = UrlKernels.resolveUrl(
      if (base == null) null else UTF8String.fromString(base),
      if (ref == null) null else UTF8String.fromString(ref))
    if (r == null) null else r.toString
  }

  test("urlResolve: absolute, protocol-relative, root, query, fragment, " +
      "relative with dot segments") {
    val b = "https://a.example/dir/page?q=1#top"
    assert(res(b, "https://x.example/p") === "https://x.example/p")
    assert(res(null, "https://x.example/p") === "https://x.example/p")
    assert(res(b, "//cdn.example/lib.js") === "https://cdn.example/lib.js")
    assert(res(b, "/rooted/path") === "https://a.example/rooted/path")
    assert(res(b, "?page=2") === "https://a.example/dir/page?page=2")
    assert(res(b, "#frag") === "https://a.example/dir/page")
    assert(res(b, "sibling") === "https://a.example/dir/sibling")
    assert(res(b, "./sibling") === "https://a.example/dir/sibling")
    assert(res(b, "../up") === "https://a.example/up")
    assert(res(b, "../../never/above/root") ===
      "https://a.example/never/above/root")
    assert(res("https://a.example", "rel") === "https://a.example/rel")
    assert(res(b, "a/./b/../c") === "https://a.example/dir/a/c")
    assert(res(b, "") === b)
    // directory-naming dot segments keep the slash
    assert(res(b, "sub/.") === "https://a.example/dir/sub/")
    // nothing absolute results → null (never a throw)
    assert(res(null, "relative/only") === null)
    assert(res("no-scheme", "relative") === null)
    assert(res(b, null) === null)
  }

  test("urlResolve: RFC 3986 scheme detection — URL-in-query refs are " +
      "relative; non-hierarchical schemes are never path-merged") {
    val b = "https://h.example/dir/page"
    // a relative ref whose QUERY contains a URL must resolve against
    // the base, not pass through as a garbage 'absolute' URL
    assert(res(b, "/out?next=https://x.com") ===
      "https://h.example/out?next=https://x.com")
    assert(res(b, "go?u=http://a.b/c") ===
      "https://h.example/dir/go?u=http://a.b/c")
    // scheme-only refs without '//' are not fetchable link targets —
    // null, never merged into the base path
    assert(res(b, "mailto:x@y.z") === null)
    assert(res(b, "javascript:void(0)") === null)
    assert(res(b, "tel:+1-555-0100") === null)
    assert(res(b, "data:text/plain,hi") === null)
    // hierarchical schemes still pass through, case-insensitive
    assert(res(b, "HTTPS://X.example/P") === "HTTPS://X.example/P")
    assert(res(b, "ftp://files.example/a") === "ftp://files.example/a")
    // a scheme needs ALPHA first: ':' leads / digit leads → relative
    assert(res(b, "1:2") === "https://h.example/dir/1:2")
  }

  private def chains(edges: Seq[(String, String)], maxHops: Int = 32) =
    Redirects.resolveChains(edges.toDF("src", "dst"),
        col("src"), col("dst"), maxHops)
      .collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)).orNull,
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))))
      .toMap

  test("2-hop chain resolves; mid-chain entry resolves shorter; cycle " +
      "never terminal") {
    val out = chains(Seq(
      ("http://s.example/a", "https://s.example/b"),
      ("https://s.example/b", "https://final.example/p"),
      ("https://loop.example/x", "https://loop.example/y"),
      ("https://loop.example/y", "https://loop.example/x")))
    assert(out("http://s.example/a") === (("https://final.example/p", 2L, true)))
    assert(out("https://s.example/b") === (("https://final.example/p", 1L, true)))
    assert(out("https://loop.example/x") === ((null, -1L, false)))
    assert(out("https://loop.example/y") === ((null, -1L, false)))
  }

  test("normalization connects spelling variants; self-loop drops; " +
      "ambiguous source takes min target") {
    val out = chains(Seq(
      // messy spelling of the same hop endpoints
      ("HTTP://S.Example:80/a?utm_source=t", "http://s.example./b#x"),
      ("http://s.example/b?", "http://t.example/done"),
      // normalized self-loop: not a hop at all
      ("https://self.example/p", "HTTPS://self.example:443/p"),
      // two targets for one source: min wins deterministically
      ("https://two.example/s", "https://two.example/zzz"),
      ("https://two.example/s", "https://two.example/aaa")))
    assert(out("http://s.example/a") === (("http://t.example/done", 2L, true)))
    assert(!out.contains("https://self.example/p"))
    assert(out("https://two.example/s")._1 === "https://two.example/aaa")
  }

  test("maxHops bounds: a chain longer than the bound is not terminal, " +
      "one exactly at it is") {
    val edges = (0 until 5).map(i =>
      (s"https://c.example/$i", s"https://c.example/${i + 1}"))
    val at5 = chains(edges, maxHops = 5)
    assert(at5("https://c.example/0") === (("https://c.example/5", 5L, true)))
    val at4 = chains(edges, maxHops = 4)
    assert(at4("https://c.example/0") === ((null, -1L, false)))
    assert(at4("https://c.example/1") === (("https://c.example/5", 4L, true)))
    // maxHops = 1: single-hop chains still resolve (round-count edge)
    val one = chains(Seq(("https://o.example/a", "https://o.example/b")),
      maxHops = 1)
    assert(one("https://o.example/a") === (("https://o.example/b", 1L, true)))
  }
}
