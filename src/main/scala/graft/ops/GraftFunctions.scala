package graft.ops

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.core.Salt

/** SQL-surface registration for the engine's custom expressions, so the
  * `spark.sql` entry point reaches them exactly like the DataFrame API
  * (SURVEY.md §2.11):
  *
  *   SELECT salt_bucket(rowKey), simhash64(tokens) FROM …
  *
  * Two packagings: [[GraftFunctions.register]] for an existing session,
  * and [[GraftExtensions]] for
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
object GraftFunctions {

  private def one(args: Seq[Expression])(f: Expression => Expression): Expression = {
    require(args.length == 1, "expected one argument")
    f(args.head)
  }

  private def two(args: Seq[Expression])(f: (Expression, Expression) => Expression): Expression = {
    require(args.length == 2, "expected two arguments")
    f(args.head, args(1))
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "salt_bucket" -> (one(_)(SaltBucket(_, Salt.Buckets))),
    "simhash64" -> (one(_)(SimHash64Expr)),
    "minhash_sig" -> (one(_)(MinHashSigExpr(_, 24))),
    "word_ngrams" -> (one(_)(WordNgramsExpr(_, 2))),
    "rolling_min_fingerprint" -> (one(_)(RollingMinExpr(_, 4))),
    "span_hashes" -> (one(_)(SpanHashesExpr(_, 5))),
    "drop_repeated_spans" -> (one(_)(DropRepeatedSpansExpr(_, 5))),
    "nfc_clean" -> (one(_)(NfcCleanExpr)),
    "lsh_sign_bits" -> (one(_)(LshBitsExpr(_, 32))),
    "quality_stats" -> (one(_)(QualityStatsExpr(_, graft.text.TextOps.enStopwords))),
    "gopher_stats" -> (one(_)(GopherStatsExpr)),
    // "sentence_split", not "sentences": Spark ships a BUILT-IN sentences()
    // (locale-based) that a temp function would silently shadow
    "sentence_split" -> (one(_)(SentencesExpr)),
    "html_extract" -> (one(_)(HtmlExtractExpr)),
    "html_link_ppm" -> (one(_)(HtmlLinkPpmExpr)),
    "html_extract_stats" -> (one(_)(HtmlExtractStatsExpr)),
    "html_main_text" -> (one(_)(HtmlMainTextExpr(_, 500000))),
    "html_meta" -> (one(_)(HtmlMetaExpr)),
    "charset_decode" -> (two(_)(CharsetDecodeExpr)),
    "robots_rules" -> (one(_)(RobotsRulesExpr(_, "*"))),
    "robots_allowed" -> (two(_)(RobotsAllowedExpr)),
    "robots_crawl_delay_ms" -> (one(_)(RobotsCrawlDelayExpr(_, "*"))),
    "robots_sitemaps" -> (one(_)(RobotsSitemapsExpr)),
    "href_texts" -> (one(_)(HrefTextsExpr)),
    "url_normalize" -> (one(_)(UrlNormalizeExpr)),
    "url_host" -> (one(_)(UrlHostExpr)),
    "url_resolve" -> (two(_)(UrlResolveExpr)),
    "sitemap_entries" -> (one(_)(SitemapEntriesExpr)),
    "image_dhash64" -> (one(_)(graft.multimodal.DHash64Expr)),
    "image_ahash64" -> (one(_)(graft.multimodal.AHash64Expr)),
    "image_phash64" -> (one(_)(graft.multimodal.PHash64Expr)),
    "gif_frame_dhashes" -> (one(_)(graft.multimodal.FrameDHashesExpr(_, 8))),
    "gif_frame_phashes" -> (one(_)(graft.multimodal.FramePHashesExpr(_, 8))),
    "audio_fingerprint64" -> (one(_)(graft.multimodal.AudioFingerprint64Expr)),
    // window size is a REQUIRED literal, not a pinned default: samples
    // per unit time depend on the clip's own rate and channel count
    // (a 50 ms frame is 400 samples at 8 kHz mono, 4410 at 44.1 kHz),
    // so a one-size constant would silently give a SQL user 5-11x the
    // intended granularity on higher-rate audio
    "audio_window_energies" -> (two(_) { (payload, window) =>
      val w = window match {
        // reject w <= 0 HERE, not downstream: windowEnergies would
        // silently return an empty array for every row, so a SQL typo
        // (0, or a negated constant) would read as "no decodable audio"
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) if v > 0 => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) =>
          throw new IllegalArgumentException(
            "audio_window_energies(payload, windowSamples): windowSamples " +
              s"must be positive, got $v")
        case other => throw new IllegalArgumentException(
          "audio_window_energies(payload, windowSamples): windowSamples " +
            s"must be an integer literal, got $other")
      }
      graft.multimodal.AudioWindowEnergiesExpr(payload, w)
    }),
    "warc_cdx" -> (one(_)(graft.ingest.WarcCdxExpr)),
    "vec_dot" -> (two(_)(VecDotExpr)),
    "l2_normalize" -> (one(_)(L2NormalizeExpr)),
    "hash_embed" -> (one(_)(HashEmbedExpr(_, 64))),
    // aggregates: the analyzer wraps AggregateFunction expressions
    "vec_sum" -> (one(_)(VecSumAggregate(_))),
    "pack_agg" -> (one(_)(PackAggregate(_))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** Session-extension packaging: injects every graft SQL function at
  * session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[GraftExtensions].getName, name),
          builder))
    }
}
