package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, coalesce, element_at, lit, lower, regexp_extract, trim, typedLit, udf}

/** Registration of the domain functions as Spark UDFs (SQL + Column API).
  *
  * These are the only non-builtin scalar functions the engine needs
  * (SURVEY §2.11); everything else is `org.apache.spark.sql.functions`.
  * They are deterministic (marked `asNondeterministic` NOT set) so Catalyst
  * can push/pre-compute them; sort keys in particular are plain string
  * columns afterwards, keeping windows/joins inside Tungsten.
  */
object GraftFunctions {

  val versionSortKeyUdf =
    udf((scheme: String, v: String) => VersionOrd.sortKey(scheme, v))
  val versionCmpUdf =
    udf((scheme: String, a: String, b: String) => VersionOrd.compare(scheme, a, b))
  val versionInRangeUdf = udf((version: String, spec: String) =>
    try Vers.versionInRange(version, spec) catch { case _: Exception => false })
  val versExactPinsUdf = udf((spec: String) =>
    try Vers.exactVersions(spec)._1 catch { case _: Exception => Seq.empty[String] })
  val versExcludedUdf = udf((spec: String) =>
    try Vers.exactVersions(spec)._2 catch { case _: Exception => Seq.empty[String] })
  val purlNormalizeUdf = udf((purl: String) =>
    try PurlCodec.normalize(purl) catch { case _: Exception => null })
  val purlPlainUdf = udf((purl: String) =>
    try PurlCodec.parse(purl).plain.format catch { case _: Exception => null })
  val purlVersionSchemeUdf = udf((purl: String) =>
    try PurlCodec.parse(purl).versionScheme catch { case _: Exception => "generic" })
  val contentIdUdf = udf((text: String) => CanonicalJson.contentId(text))
  val cvssBaseScoreUdf = udf((vector: String) =>
    if (vector == null) null
    else Cvss.baseScore(vector).map(Double.box).orNull)
  val cvssRatingUdf = udf((score: Double) => Cvss.rating(score))
  val severityScoreUdf = udf((value: String) =>
    Risk.parseScore(value).map(Double.box).orNull)
  // float(value) alone — the risk path's first rung (risk.py:52-53):
  // lets the CVSS-vector fallback run BEFORE the textual-else-0 rung, so
  // a vector-valued severity scores as its base score, not as unknown=0.
  val numericScoreUdf = udf((value: String) =>
    Option(value).getOrElse("").trim.toDoubleOption.map(Double.box).orNull)
  val urlDomainUdf = udf((url: String) => Risk.urlDomain(url))

  val cleanSummaryUdf = udf((s: String) => TextUtil.cleanSummary(s))
  val frontMatterUdf = udf((s: String) => {
    val (front, body) = TextUtil.splitFrontMatter(s)
    (front, body)
  })
  val patchSourceUdf = udf((url: String) => TextUtil.classifyPatchSource(url))
  val ssvcDecisionUdf = udf((e: String, a: String, t: String, m: String) =>
    Ssvc.decision(e, a, t, m))
  val ssvcVectorUdf = udf((e: String, a: String, t: String, m: String) =>
    Ssvc.vector(e, a, t, m))

  /** Parsed SSVC vector: expanded options (vector order) + decision. */
  final case class SsvcOption(name: String, value: String)
  final case class SsvcParsed(options: Seq[SsvcOption], decision: String)
  val ssvcParseUdf = udf((vector: String) =>
    Ssvc.parseVector(vector).map { case (opts, d) =>
      SsvcParsed(opts.map { case (n, v) => SsvcOption(n, v) }, d)
    }.orNull)

  /** Column helpers route to the CODEGEN'D native expressions
    * (expr/VersionExpressions.scala), not the Scala UDFs above: the UDF
    * form pays an InternalRow conversion + breaks WholeStageCodegen on
    * every row of the unfurl join — the engine's hottest scan. The UDF
    * twins stay registered for spark.sql textual use only.
    * Requires the GraftExtensions function registry (set by
    * core.Sessions for every engine session). */
  def versionSortKey(scheme: Column, v: Column): Column =
    call_function("version_sort_key_native", scheme, v)
  def versionInRange(version: Column, spec: Column): Column =
    call_function("version_in_range_native", version, spec)

  /** univers version-range scheme for a base purl, as a codegen'd column:
    * ptype via regexp_extract + a literal map lookup (PurlCodec
    * .versionScheme's table), default "generic". Keeps versionRank's
    * sort-key derivation UDF-free. */
  def purlVersionScheme(basePurl: Column): Column = {
    val m = typedLit(PurlCodec.SchemeByPtype)
    // tolerate the spellings PurlCodec.parse tolerates: surrounding
    // whitespace, leading slashes after pkg:, uppercase types
    // (spec-normalized to lowercase) — pinned against the scalar twin
    // by NativeTwinsSpec. Known residual divergence: a percent-ENCODED
    // type ("pkg:np%6Dm/x") decodes through the scalar parse but falls
    // to 'generic' here — the purl spec forbids encoding the type, and
    // no ingest emits one
    // leading junk is stripped by the regex, NOT Spark's trim():
    // PurlCodec.parse trims with Java String.trim (every char <=
    // U+0020 — tabs, newlines, controls) while Spark trim strips only
    // ASCII space
    val ptype = lower(regexp_extract(basePurl,
      "^[\\x00-\\x20]*pkg:/*([^/]+)/", 1))
    coalesce(element_at(m, ptype), lit("generic"))
  }

  /** Register all functions for spark.sql use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("version_sort_key", versionSortKeyUdf)
    spark.udf.register("version_cmp", versionCmpUdf)
    spark.udf.register("version_in_range", versionInRangeUdf)
    spark.udf.register("vers_exact_pins", versExactPinsUdf)
    spark.udf.register("vers_excluded", versExcludedUdf)
    spark.udf.register("purl_normalize", purlNormalizeUdf)
    spark.udf.register("purl_plain", purlPlainUdf)
    spark.udf.register("purl_version_scheme", purlVersionSchemeUdf)
    spark.udf.register("content_id", contentIdUdf)
    spark.udf.register("cvss_base_score", cvssBaseScoreUdf)
    spark.udf.register("cvss_rating", cvssRatingUdf)
    spark.udf.register("severity_score", severityScoreUdf)
    spark.udf.register("url_domain", urlDomainUdf)
    spark.udf.register("ssvc_parse", ssvcParseUdf)
    spark.udf.register("clean_summary", cleanSummaryUdf)
    spark.udf.register("front_matter", frontMatterUdf)
    spark.udf.register("patch_source", patchSourceUdf)
    spark.udf.register("ssvc_decision", ssvcDecisionUdf)
    spark.udf.register("ssvc_vector", ssvcVectorUdf)
    ()
  }
}
