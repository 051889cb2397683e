package graft.export

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import FederatedExport.{listBody, yamlQuote}

/** V1 FederatedCode export layout (management/commands/export.py +
  * aboutcode/hashid): one YAML document per vulnerability VCID sharded
  * on the VCID's first two uid characters, plus per-package `purls.yml`
  * (known versions) and `vulnerabilities.yml` (affected-by / fixing
  * VCIDs per version) sharded by the tiered purl hash.
  *
  * Spark-first shape: every path and document is one projection over
  * the v1 marts — the purl hash (sha256 low bits, hex) runs as codegen
  * column arithmetic, the per-package documents are one groupBy over
  * the version-grain mart, and the write is a partitioned text sink.
  * The reference's per-package Python loop (export.py:94-160) becomes
  * a distributed scan: at 100 TB the export is shuffle-once on the
  * core-purl key, no driver iteration.
  */
object V1Export {

  /** Repos-per-ecosystem tier table (hashid BIT_COUNT_BY_ECOSYSTEM:175-212)
    * — bit width of the purl-hash space. The Small Ecosystem tier is 0
    * bits (a single repository); unlisted types also default to 0 per
    * `BIT_COUNT_BY_ECOSYSTEM.get(purl.type, 0)` (hashid:285). */
  val bitCountByType: Map[String, Int] = Map(
    "github" -> 10, "npm" -> 10,
    "golang" -> 7, "maven" -> 7, "nuget" -> 7, "perl" -> 7, "php" -> 7,
    "pypi" -> 7, "ruby" -> 7,
    "alpm" -> 5, "bitbucket" -> 5, "cocoapods" -> 5, "composer" -> 5,
    "deb" -> 5, "docker" -> 5, "gem" -> 5, "generic" -> 5,
    "huggingface" -> 5, "mlflow" -> 5, "pub" -> 5, "rpm" -> 5,
    "bitnami" -> 0, "cargo" -> 0, "conan" -> 0, "conda" -> 0, "cpan" -> 0,
    "cran" -> 0, "hackage" -> 0, "hex" -> 0, "luarocks" -> 0, "swift" -> 0)

  private val bitsExpr: Column => Column = ptype =>
    bitCountByType.foldLeft(lit(0)) { case (acc, (t, b)) =>
      when(ptype === t, lit(b)).otherwise(acc)
    }

  /** Tiered purl hash (hashid get_purl_hash:342-410): sha256 of the
    * CORE purl (version/qualifiers/subpath dropped) as big-endian int,
    * modulo 2^bits, lowercase hex zero-padded to ceil(bits/4) chars.
    * Only the digest's low 32 bits participate once the modulus is
    * ≤2^10, so the arithmetic stays in one long. */
  def purlHash(corePurl: Column, ptype: Column): Column = {
    val bits = bitsExpr(ptype)
    val low32 = conv(substring(sha2(corePurl, 256), 57, 8), 16, 10)
      .cast("long")
    // 2^bits as a long (bits ≤ 10, exact in double); shiftleft's Scala
    // signature only takes a literal Int shift
    val value = pmod(low32, pow(lit(2.0), bits).cast("long"))
    // Python renders f"{short_hash:0{ceil(bits/4)}x}" — int formatting
    // always emits at least ONE digit, so a 0-bit (Small Ecosystem /
    // unlisted) type hashes to "0", never "".
    val width = greatest(lit(1), ceil(bits.cast("double") / 4.0).cast("int"))
    lpad(lower(hex(value)), width, lit("0"))
  }

  /** `aboutcode-packages-<type>-<hash>/<type>[/<ns>]/<name>` — the
    * package base directory (hashid get_package_base_dir). */
  def packageBaseDir(corePurl: Column, ptype: Column, namespace: Column,
      name: Column): Column =
    concat(lit("aboutcode-packages-"), ptype, lit("-"),
      purlHash(corePurl, ptype), lit("/"), ptype, lit("/"),
      when(namespace.isNull || namespace === "", name)
        .otherwise(concat(namespace, lit("/"), name)))

  /** `aboutcode-vulnerabilities/<uid[0:2]>/<VCID>.yml`
    * (hashid vulnerability_yml_path: shard on the first two characters
    * after the "VCID-" prefix). */
  def vcidPath(vcid: Column): Column =
    concat(lit("aboutcode-vulnerabilities/"), substring(vcid, 6, 2),
      lit("/"), vcid, lit(".yml"))

  /** Per-VCID vulnerability documents (export.py:38-62
    * serialize_vulnerability): (path, yaml, vulnerability_id).
    *
    * Input mart columns: vulnerability_id, aliases array<string>,
    * summary, severities array<struct{scoring_system,value,
    * scoring_elements,url}>, weaknesses array<int>, references
    * array<struct{url,reference_type,reference_id}>.
    *
    * The v1 serializer stringifies the (always-absent here)
    * severity publication time as Python `str(None)` — the literal
    * scalar `None`, pinned by the export_command golden. */
  def vulnerabilityDocs(vulns: DataFrame): DataFrame = {
    val sevItems = transform(col("severities"), s => concat(
      lit("  - score: "), yamlQuote(s.getField("value")),
      lit("\n    scoring_system: "), yamlQuote(s.getField("scoring_system")),
      lit("\n    scoring_elements: "),
      yamlQuote(s.getField("scoring_elements")),
      lit("\n    published_at: \"None\""),
      lit("\n    url: "), yamlQuote(s.getField("url"))))
    val refItems = transform(col("references"), r => concat(
      lit("  - url: "), yamlQuote(r.getField("url")),
      lit("\n    reference_type: "), yamlQuote(r.getField("reference_type")),
      lit("\n    reference_id: "), yamlQuote(r.getField("reference_id"))))
    val weakItems = transform(col("weaknesses"),
      w => concat(lit("  - CWE-"), w.cast("string")))
    val aliasItems = transform(col("aliases"),
      a => concat(lit("  - "), yamlQuote(a)))
    vulns.select(
      col("vulnerability_id"),
      vcidPath(col("vulnerability_id")).as("path"),
      concat(
        lit("vulnerability_id: "), yamlQuote(col("vulnerability_id")),
        lit("\naliases:"), listBody(aliasItems),
        lit("\nsummary: "), yamlQuote(col("summary")),
        lit("\nseverities:"), listBody(sevItems),
        lit("\nweaknesses:"), listBody(weakItems),
        lit("\nreferences:"), listBody(refItems),
        lit("\n")).as("yaml"))
  }

  /** Per-package documents (export.py:110-155): one `purls.yml` (the
    * known version purls, oldest first) and one `vulnerabilities.yml`
    * (per-version affected-by / fixing VCID lists) per core package.
    *
    * Input: version grain — ptype, namespace (nullable), name,
    * purl (versioned), version_rank (ecosystem order), affected_by
    * array<string>, fixing array<string>. One shuffle on the core key.
    */
  def packageDocs(pkgVulns: DataFrame): DataFrame = {
    val perVersion = struct(col("version_rank"), col("purl"),
      concat(
        lit("- purl: "), yamlQuote(col("purl")),
        lit("\n  affected_by_vulnerabilities:"),
        listBody(transform(col("affected_by"),
          v => concat(lit("    - "), yamlQuote(v)))),
        lit("\n  fixing_vulnerabilities:"),
        listBody(transform(col("fixing"),
          v => concat(lit("    - "), yamlQuote(v))))).as("item"))
    pkgVulns
      .groupBy("ptype", "namespace", "name")
      .agg(sort_array(collect_list(perVersion)).as("vs"))
      .withColumn("base_dir", packageBaseDir(
        concat(lit("pkg:"), col("ptype"), lit("/"),
          when(col("namespace").isNull || col("namespace") === "", col("name"))
            .otherwise(concat(col("namespace"), lit("/"), col("name")))),
        col("ptype"), col("namespace"), col("name")))
      .select(
        col("base_dir"),
        concat(col("base_dir"), lit("/purls.yml")).as("purls_path"),
        concat(array_join(transform(col("vs"),
          v => concat(lit("- "), yamlQuote(v.getField("purl")))), "\n"),
          lit("\n")).as("purls_yaml"),
        concat(col("base_dir"), lit("/vulnerabilities.yml"))
          .as("vulnerabilities_path"),
        concat(array_join(transform(col("vs"), v => v.getField("item")),
          "\n"), lit("\n")).as("vulnerabilities_yaml"))
  }

  /** purl2cpe dump rows (management/commands/purl2cpe.py:30-64 +
    * models.py VulnerabilityQuerySet.with_packages/with_cpes,
    * get_related_cves/purls/cpes): per vulnerability with at least one
    * related package AND one NVD CPE reference, its CVE aliases
    * (`startswith("CVE")`), related purls, and CPE reference ids
    * (`startswith("cpe")`); the dump files group the documents by CVE
    * year, and a vulnerability is appended once PER CVE alias
    * (`for cve in p2c.cves: by_years[...].append` — two same-year CVEs
    * list it twice), so the grain here is (vulnerability, cve) with
    * `year = cve.split("-")[1]`. Lists are sorted+deduped (the
    * reference's `.distinct()` querysets in DB order — sorting is the
    * deterministic canonicalization).
    *
    * Input grain: (vulnerability_id, aliases array<string>,
    * reference_ids array<string>, purls array<string>). Map-only after
    * the input's own aggregation — no shuffle at any corpus size.
    */
  def purl2cpe(vulns: DataFrame): DataFrame =
    vulns
      .withColumn("cves", array_sort(array_distinct(
        filter(col("aliases"), a => a.startsWith("CVE")))))
      .withColumn("cpes", array_sort(array_distinct(
        filter(col("reference_ids"), r => r.startsWith("cpe")))))
      .withColumn("purls", array_sort(array_distinct(col("purls"))))
      .filter(size(col("cpes")) > 0 && size(col("purls")) > 0)
      .select(col("vulnerability_id").as("vulnerablecode_id"),
        col("cves"), col("purls"), col("cpes"),
        explode(col("cves")).as("cve"))
      .withColumn("year", split(col("cve"), "-").getItem(1))

  /** [[purl2cpe]] assembled from the engine marts: aliases and
    * reference ids from the latest advisories rolled to the V1
    * vulnerability grain through the alias-set membership, purls from
    * every related (affected or fixing) concrete package. Three
    * partial-aggregating groupBys on vulnerability_id — the reference's
    * per-vulnerability Python loop becomes one shuffle per facet. */
  def purl2cpeFromMarts(membership: DataFrame, advisories: DataFrame,
      unfurled: DataFrame): DataFrame = {
    val member = membership.select("avid", "vulnerability_id")
    val latest = advisories.filter(col("is_latest"))
    val aliases = latest
      .select(col("avid"), explode(col("aliases")).as("alias"))
      .join(member, Seq("avid"))
      .groupBy("vulnerability_id")
      .agg(collect_set(col("alias")).as("aliases"))
    val refIds = latest
      .select(col("avid"), explode(col("references")).as("r"))
      .select(col("avid"), col("r.reference_id").as("rid"))
      .filter(col("rid").isNotNull && col("rid") =!= "")
      .join(member, Seq("avid"))
      .groupBy("vulnerability_id")
      .agg(collect_set(col("rid")).as("reference_ids"))
    val purls = unfurled
      .filter(col("is_affected") || col("is_fixed"))
      .select(col("avid"),
        concat(col("base_purl"), lit("@"), col("version")).as("purl"))
      .join(member, Seq("avid"))
      .groupBy("vulnerability_id")
      .agg(collect_set(col("purl")).as("purls"))
    val emptyArr = array().cast("array<string>")
    purl2cpe(refIds
      .join(aliases, Seq("vulnerability_id"), "left")
      .join(purls, Seq("vulnerability_id"), "left")
      .select(col("vulnerability_id"),
        coalesce(col("aliases"), emptyArr).as("aliases"),
        col("reference_ids"),
        coalesce(col("purls"), emptyArr).as("purls")))
  }
}
