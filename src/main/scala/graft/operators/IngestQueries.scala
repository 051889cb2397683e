package graft.operators

import graft.core.{QueryEntry, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{AdvisoryJsonIngest, EpssIngest, OsvIngest, OvalIngest, VulnrichmentIngest}

/** SURVEY §2 S1–S4 driver-oracle coverage: the ingest parse layer run
  * through the REAL readTree/parse paths over checked-in fixture batches,
  * with DuckDB re-deriving the same normalization from the same files via
  * `read_json`/`read_csv`. This puts the byte-exact oracle bar on the
  * parse layer that every downstream operator already meets (r05 verdict
  * "What's missing" #1); the per-source golden specs stay as the broader
  * format net.
  *
  * Reference: importer.py:789-920 (tree scan → AdvisoryData),
  * importers/osv.py:51-331 (OSV mapping), v2_importers/
  * vulnrichment_importer.py:30-210 (CVE 5.x + ADP), v2_importers/
  * epss_importer_v2.py:26-96 (EPSS CSV).
  *
  * Output rows flatten nested arrays to joined strings and timestamps to
  * epoch seconds so the driver's column-sorted hash compare is
  * representation-independent. Fixture paths are absolute — the driver's
  * DuckDB session need not share Verify's working directory.
  */
object IngestQueries extends QueryModule {

  // Fixture root resolution order: explicit env override → the checkout's
  // working directory (Verify/Bench run from the repo root) → the
  // canonical driver checkout path as a last resort. The resolved path is
  // absolute because it is also spliced into the oracle SQL the driver's
  // DuckDB session runs from an arbitrary cwd.
  private val Fix: String = sys.env.get("SPARK_GRAFT_FIXTURES")
    .orElse {
      val rel = java.nio.file.Paths.get("src/test/resources/fixtures")
      if (java.nio.file.Files.isDirectory(rel))
        Some(rel.toAbsolutePath.normalize.toString)
      else None
    }
    .getOrElse("/root/repo/src/test/resources/fixtures")

  private def joined(arr: Column, f: Column => Column,
      sep: String = ";"): Column =
    array_join(transform(arr, f), sep)

  // --- S1/format: AdvisoryDataV2 JSON trees (the reference's own dump
  // format, importer.py:677-689), three datasources in one batch.

  private def advisoryTreeSpark(s: SparkSession): DataFrame = {
    val rows = Seq("pypa", "ghsa", "debian")
      .map(src => AdvisoryJsonIngest
        .readTree(s, s"$Fix/advisories/$src", src).toDF())
      .reduce(_ unionByName _)
    rows.select(
      col("datasource_id"), col("advisory_id"), col("summary"),
      array_join(col("aliases"), ",").as("aliases_csv"),
      joined(col("affected"), a => a.getField("purl")).as("purls"),
      joined(col("affected"), a => a.getField("affecting_vers"))
        .as("affecting"),
      joined(col("affected"), a => a.getField("fixed_vers")).as("fixed"),
      joined(col("references"), r => r.getField("reference_type"))
        .as("ref_types"),
      joined(col("references"), r => r.getField("reference_id"))
        .as("ref_ids"),
      joined(col("severities"), v => concat(v.getField("scoring_system"),
        lit("="), v.getField("value"))).as("sevs"),
      joined(col("weaknesses"), w => w.cast("string"), ",").as("cwes"),
      col("date_published").cast("long").as("published_ep"),
      col("url"))
      .orderBy("advisory_id")
  }

  private def advisoryTreeOracle: String = {
    val cols =
      """columns={'advisory_id':'VARCHAR','aliases':'VARCHAR[]',
        |  'summary':'VARCHAR',
        |  'affected_packages':'STRUCT(package STRUCT(type VARCHAR,
        |     namespace VARCHAR, name VARCHAR, version VARCHAR,
        |     qualifiers VARCHAR, subpath VARCHAR),
        |     affected_version_range VARCHAR, fixed_version_range VARCHAR,
        |     fixed_by_commit_patches STRUCT(vcs_url VARCHAR,
        |     commit_hash VARCHAR)[])[]',
        |  'references':'STRUCT(reference_id VARCHAR,
        |     reference_type VARCHAR, url VARCHAR)[]',
        |  'severities':'STRUCT(system VARCHAR, value VARCHAR,
        |     scoring_elements VARCHAR, published_at VARCHAR)[]',
        |  'date_published':'VARCHAR','weaknesses':'INTEGER[]',
        |  'url':'VARCHAR'}""".stripMargin
    val branches = Seq("pypa", "ghsa", "debian").map { src =>
      s"""SELECT '$src' AS datasource_id, * FROM
         |read_json('$Fix/advisories/$src/*.json', $cols)""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH raw AS (
       |  $branches)
       |SELECT datasource_id, advisory_id, coalesce(summary, '') AS summary,
       |  coalesce(array_to_string(coalesce(aliases, []), ','), '') AS aliases_csv,
       |  coalesce(array_to_string(list_transform(coalesce(affected_packages, []),
       |    a -> 'pkg:' || lower(a.package.type) ||
       |         CASE WHEN length(coalesce(a.package.namespace, '')) > 0
       |              THEN '/' || a.package.namespace ELSE '' END ||
       |         '/' || a.package.name), ';'), '') AS purls,
       |  coalesce(array_to_string(list_transform(coalesce(affected_packages, []),
       |    a -> coalesce(a.affected_version_range, '')), ';'), '') AS affecting,
       |  coalesce(array_to_string(list_transform(coalesce(affected_packages, []),
       |    a -> coalesce(a.fixed_version_range, '')), ';'), '') AS fixed,
       |  coalesce(array_to_string(list_transform(coalesce("references", []),
       |    r -> coalesce(r.reference_type, 'other')), ';'), '') AS ref_types,
       |  coalesce(array_to_string(list_transform(coalesce("references", []),
       |    r -> coalesce(r.reference_id,
       |         regexp_extract(r.url, '[^/]+$$', 0))), ';'), '') AS ref_ids,
       |  coalesce(array_to_string(list_transform(coalesce(severities, []),
       |    v -> v."system" || '=' || v.value), ';'), '') AS sevs,
       |  coalesce(array_to_string(list_transform(coalesce(weaknesses, []),
       |    w -> CAST(w AS VARCHAR)), ','), '') AS cwes,
       |  CAST(epoch(TRY_CAST(date_published AS TIMESTAMPTZ)) AS BIGINT)
       |    AS published_ep,
       |  coalesce(url, '') AS url
       |FROM raw ORDER BY advisory_id""".stripMargin
  }

  // --- S4: raw OSV format (importers/osv.py:51-331) — ecosystem→scheme
  // mapping, range events → vers constraints, version pins.

  // sevs projects scoring_system=scoring_elements (the vector): the
  // COMPUTED cvss value is covered by CapturedFixtureSpec against the
  // reference's captured expected files — DuckDB cannot replay the CVSS
  // formula in SQL.
  private def osvTreeSpark(s: SparkSession): DataFrame =
    OsvIngest.readTree(s, s"$Fix/osv", "osv").toDF().select(
      col("advisory_id"), col("summary"),
      array_join(col("aliases"), ",").as("aliases_csv"),
      joined(col("affected"), a => a.getField("purl")).as("purls"),
      joined(col("affected"), a => a.getField("affecting_vers"))
        .as("affecting"),
      joined(col("affected"), a => a.getField("fixed_vers")).as("fixed"),
      joined(col("references"), r => r.getField("reference_type"))
        .as("ref_types"),
      joined(col("references"), r => r.getField("url")).as("ref_urls"),
      joined(col("severities"), v => concat(v.getField("scoring_system"),
        lit("="), v.getField("scoring_elements"))).as("sevs"),
      col("date_collected").cast("long").as("collected_ep"),
      col("date_published").cast("long").as("published_ep"),
      col("url"))
      .orderBy("advisory_id")

  private def osvTreeOracle: String =
    s"""WITH raw AS (
       |  SELECT * FROM read_json('$Fix/osv/*.json',
       |    columns={'id':'VARCHAR','summary':'VARCHAR','details':'VARCHAR',
       |      'aliases':'VARCHAR[]','published':'VARCHAR',
       |      'modified':'VARCHAR',
       |      'affected':'STRUCT(package STRUCT(ecosystem VARCHAR,
       |         name VARCHAR, purl VARCHAR),
       |         ranges STRUCT(type VARCHAR, events STRUCT(
       |           introduced VARCHAR, fixed VARCHAR,
       |           last_affected VARCHAR)[])[],
       |         versions VARCHAR[])[]',
       |      'severity':'STRUCT(type VARCHAR, score VARCHAR)[]',
       |      'references':'STRUCT(type VARCHAR, url VARCHAR)[]'})),
       |n AS (
       |  SELECT id, summary, details, aliases, published, modified,
       |    severity, "references",
       |    list_filter(list_transform(coalesce(affected, []),
       |      a -> struct_pack(
       |      purl := CASE
       |        WHEN a.package.purl IS NOT NULL THEN a.package.purl
       |        WHEN lower(a.package.ecosystem) = 'debian'
       |          THEN 'pkg:deb/debian/' || a.package.name
       |        WHEN lower(a.package.ecosystem) LIKE 'ubuntu%'
       |          THEN 'pkg:deb/ubuntu/' || a.package.name
       |        ELSE 'pkg:' || (CASE lower(a.package.ecosystem)
       |          WHEN 'pypi' THEN 'pypi' WHEN 'npm' THEN 'npm'
       |          WHEN 'maven' THEN 'maven' WHEN 'nuget' THEN 'nuget'
       |          WHEN 'packagist' THEN 'composer'
       |          WHEN 'rubygems' THEN 'gem' WHEN 'go' THEN 'golang'
       |          WHEN 'hex' THEN 'hex' WHEN 'cargo' THEN 'cargo'
       |          ELSE NULL END) || '/' || a.package.name END,
       |      -- vers scheme = purl type (reference RANGE_CLASS_BY_SCHEMES)
       |      scheme := CASE
       |        WHEN a.package.purl IS NOT NULL THEN
       |          regexp_extract(a.package.purl, '^pkg:([^/]+)/', 1)
       |        WHEN lower(a.package.ecosystem) = 'debian'
       |          OR lower(a.package.ecosystem) LIKE 'ubuntu%' THEN 'deb'
       |        ELSE CASE lower(a.package.ecosystem)
       |          WHEN 'pypi' THEN 'pypi' WHEN 'npm' THEN 'npm'
       |          WHEN 'maven' THEN 'maven' WHEN 'nuget' THEN 'nuget'
       |          WHEN 'packagist' THEN 'composer'
       |          WHEN 'rubygems' THEN 'gem' WHEN 'go' THEN 'golang'
       |          WHEN 'hex' THEN 'hex' WHEN 'cargo' THEN 'cargo'
       |          ELSE NULL END END,
       |      -- explicit version pins WIN over event-derived constraints
       |      -- (osv_v2.py:175-177); introduced '0' contributes nothing;
       |      -- GIT ranges never yield version constraints
       |      aff := CASE WHEN len(coalesce(a.versions, [])) > 0
       |        THEN list_transform(a.versions, v -> '=' || v)
       |        ELSE list_filter(
       |          flatten(list_transform(
       |            list_filter(coalesce(a.ranges, []),
       |              rg -> rg.type IN ('ECOSYSTEM', 'SEMVER')),
       |            rg -> list_transform(rg.events, e ->
       |              CASE WHEN e.introduced = '0' THEN NULL
       |                   WHEN e.introduced IS NOT NULL
       |                     THEN '>=' || e.introduced
       |                   WHEN e.fixed IS NOT NULL THEN '<' || e.fixed
       |                   WHEN e.last_affected IS NOT NULL
       |                     THEN '<=' || e.last_affected
       |                   ELSE NULL END))),
       |          c -> c IS NOT NULL) END,
       |      fix := list_filter(
       |        flatten(list_transform(
       |          list_filter(coalesce(a.ranges, []),
       |            rg -> rg.type IN ('ECOSYSTEM', 'SEMVER')),
       |          rg -> list_transform(rg.events, e ->
       |            CASE WHEN e.fixed IS NOT NULL THEN '=' || e.fixed
       |                 ELSE NULL END))), c -> c IS NOT NULL))),
       |      a -> a.purl IS NOT NULL AND
       |        (len(a.aff) > 0 OR len(a.fix) > 0))
       |      AS affected
       |  FROM raw)
       |SELECT id AS advisory_id,
       |  CASE WHEN coalesce(details, '') = '' THEN coalesce(summary, '')
       |       WHEN coalesce(summary, '') <> ''
       |            AND strpos(details, summary) = 0
       |         THEN summary || chr(10) || details
       |       ELSE details END AS summary,
       |  coalesce(array_to_string(list_filter(coalesce(aliases, []),
       |    x -> x <> id), ','), '') AS aliases_csv,
       |  coalesce(array_to_string(list_transform(affected, a -> a.purl), ';'), '')
       |    AS purls,
       |  coalesce(array_to_string(list_transform(affected, a ->
       |    'vers:' || a.scheme || '/' || array_to_string(a.aff, '|')), ';'), '')
       |    AS affecting,
       |  coalesce(array_to_string(list_transform(affected, a ->
       |    'vers:' || a.scheme || '/' ||
       |    coalesce(array_to_string(a.fix, '|'), '')), ';'), '')
       |    AS fixed,
       |  coalesce(array_to_string(list_transform(coalesce("references", []), r ->
       |    CASE r.type WHEN 'ADVISORY' THEN 'advisory'
       |                WHEN 'EXPLOIT' THEN 'exploit'
       |                WHEN 'REPORT' THEN 'bug'
       |                ELSE 'other' END), ';'), '') AS ref_types,
       |  coalesce(array_to_string(list_transform(coalesce("references", []),
       |    r -> r.url), ';'), '') AS ref_urls,
       |  -- CVSS_V2 is unmapped in the reference's severity map -> dropped;
       |  -- system=vector pairs (computed values are fixture-tested)
       |  coalesce(array_to_string(list_transform(
       |    list_filter(coalesce(severity, []), v -> v.type <> 'CVSS_V2'),
       |    v -> (CASE v.type WHEN 'CVSS_V3' THEN 'cvssv3.1'
       |                 WHEN 'CVSS_V4' THEN 'cvssv4'
       |                 ELSE lower(v.type) END) || '=' || v.score), ';'), '')
       |    AS sevs,
       |  coalesce(CAST(epoch(TRY_CAST(modified AS TIMESTAMPTZ)) AS BIGINT),
       |    CAST(epoch(TRY_CAST(published AS TIMESTAMPTZ)) AS BIGINT), 0)
       |    AS collected_ep,
       |  CAST(epoch(TRY_CAST(published AS TIMESTAMPTZ)) AS BIGINT)
       |    AS published_ep,
       |  'https://osv.dev/vulnerability/' || id AS url
       |FROM n ORDER BY advisory_id""".stripMargin

  // --- S2: CISA vulnrichment CVE 5.x (+ADP). SSVC severities come from a
  // decision-tree calculator the oracle can't replay in SQL, so the
  // projection keeps every severity EXCEPT ssvc; refs (tag-fold types +
  // sorted CPE refs) and both CWE derivations are compared in full.

  private def vulnrichmentSpark(s: SparkSession): DataFrame = {
    // Two dirs: the golden-pipeline fixture plus this query's richer CVE
    // (multi-metric, tag-fold, dual CWE derivation) — kept out of
    // fixtures/vulnrichment so GoldenPipelineSpec's inputs stay frozen.
    val raw = s.read.option("wholetext", "true")
      .text(s"$Fix/vulnrichment", s"$Fix/cve5")
      .select(col("value").as("json"),
        lit("vulnrichment").as("datasource_id"))
    VulnrichmentIngest.parse(s, raw).toDF().select(
      col("advisory_id"), col("summary"),
      joined(col("references"), r => concat(r.getField("reference_type"),
        lit("@"), r.getField("reference_id"))).as("refs"),
      joined(filter(col("severities"),
        v => v.getField("scoring_system") =!= "ssvc"),
        v => concat(v.getField("scoring_system"), lit("="),
          v.getField("value"), lit("|"),
          v.getField("scoring_elements"))).as("sevs"),
      joined(col("weaknesses"), w => w.cast("string"), ",").as("cwes"),
      col("date_published").cast("long").as("published_ep"),
      col("url"))
      .orderBy("advisory_id")
  }

  private def vulnrichmentOracle: String =
    s"""WITH raw AS (
       |  SELECT * FROM read_json(
       |    ['$Fix/vulnrichment/*.json', '$Fix/cve5/*.json'],
       |    columns={'cveMetadata':'STRUCT(cveId VARCHAR, state VARCHAR,
       |        datePublished VARCHAR)',
       |      'containers':'STRUCT(cna STRUCT(
       |        descriptions STRUCT(lang VARCHAR, "value" VARCHAR)[],
       |        metrics STRUCT(
       |          cvssV4_0 STRUCT(vectorString VARCHAR, baseScore DOUBLE),
       |          cvssV3_1 STRUCT(vectorString VARCHAR, baseScore DOUBLE),
       |          cvssV3_0 STRUCT(vectorString VARCHAR, baseScore DOUBLE),
       |          cvssV2_0 STRUCT(vectorString VARCHAR, baseScore DOUBLE))[],
       |        affected STRUCT(cpes VARCHAR[])[],
       |        "references" STRUCT(url VARCHAR, tags VARCHAR[])[],
       |        problemTypes STRUCT(descriptions STRUCT(cweId VARCHAR,
       |          description VARCHAR)[])[]),
       |        adp STRUCT(metrics STRUCT(
       |          cvssV4_0 STRUCT(vectorString VARCHAR, baseScore DOUBLE),
       |          cvssV3_1 STRUCT(vectorString VARCHAR, baseScore DOUBLE),
       |          cvssV3_0 STRUCT(vectorString VARCHAR, baseScore DOUBLE),
       |          cvssV2_0 STRUCT(vectorString VARCHAR, baseScore DOUBLE)
       |        )[])[])'})),
       |n AS (
       |  SELECT cveMetadata.cveId AS advisory_id,
       |    cveMetadata.datePublished AS pub,
       |    list_concat(coalesce(containers.cna.metrics, []),
       |      flatten(list_transform(coalesce(containers.adp, []),
       |        a -> coalesce(a.metrics, [])))) AS all_metrics,
       |    coalesce(containers.cna."references", []) AS refs,
       |    coalesce(containers.cna.affected, []) AS aff,
       |    coalesce(containers.cna.problemTypes, []) AS pts,
       |    coalesce(containers.cna.descriptions, []) AS descs
       |  FROM raw WHERE cveMetadata.cveId IS NOT NULL)
       |SELECT advisory_id,
       |  coalesce(list_filter(descs,
       |    d -> d.lang IN ('en', 'en-US'))[-1]."value", '') AS summary,
       |  coalesce(array_to_string(list_concat(
       |    list_transform(refs, r ->
       |      (coalesce(list_filter(list_transform(
       |         coalesce(r.tags, []), t ->
       |           CASE t WHEN 'exploit' THEN 'exploit'
       |                  WHEN 'issue-tracking' THEN 'bug'
       |                  WHEN 'mailing-list' THEN 'mailing_list'
       |                  WHEN 'third-party-advisory' THEN 'advisory'
       |                  WHEN 'vendor-advisory' THEN 'advisory'
       |                  WHEN 'vdb-entry' THEN 'advisory'
       |                  ELSE NULL END),
       |         x -> x IS NOT NULL)[-1], 'other')) ||
       |      '@' || regexp_extract(r.url, '[^/]+$$', 0)),
       |    list_transform(list_sort(list_distinct(flatten(
       |      list_transform(aff, a -> coalesce(a.cpes, []))))),
       |      cpe -> 'other@' || cpe)), ';'), '') AS refs,
       |  coalesce(array_to_string(flatten(list_transform(all_metrics, m ->
       |    list_filter([
       |      CASE WHEN m.cvssV4_0.vectorString IS NOT NULL
       |        THEN 'cvssv4=' || CAST(m.cvssV4_0.baseScore AS VARCHAR) ||
       |             '|' || m.cvssV4_0.vectorString END,
       |      CASE WHEN m.cvssV3_1.vectorString IS NOT NULL
       |        THEN 'cvssv3.1=' || CAST(m.cvssV3_1.baseScore AS VARCHAR) ||
       |             '|' || m.cvssV3_1.vectorString END,
       |      CASE WHEN m.cvssV3_0.vectorString IS NOT NULL
       |        THEN 'cvssv3=' || CAST(m.cvssV3_0.baseScore AS VARCHAR) ||
       |             '|' || m.cvssV3_0.vectorString END,
       |      CASE WHEN m.cvssV2_0.vectorString IS NOT NULL
       |        THEN 'cvssv2=' || CAST(m.cvssV2_0.baseScore AS VARCHAR) ||
       |             '|' || m.cvssV2_0.vectorString END],
       |      x -> x IS NOT NULL))), ';'), '') AS sevs,
       |  coalesce(array_to_string(list_transform(list_sort(list_distinct(
       |    list_filter(flatten(list_transform(pts, pt ->
       |      flatten(list_transform(coalesce(pt.descriptions, []), d ->
       |        [CASE WHEN regexp_extract(d.cweId, 'CWE-(\\d+)', 1) <> ''
       |           THEN CAST(regexp_extract(d.cweId, 'CWE-(\\d+)', 1)
       |                AS INTEGER) END,
       |         CASE WHEN regexp_extract(d.description,
       |                'CWE-(\\d+)', 1) <> ''
       |           THEN CAST(regexp_extract(d.description, 'CWE-(\\d+)', 1)
       |                AS INTEGER) END])))),
       |      w -> w IS NOT NULL))),
       |    w -> CAST(w AS VARCHAR)), ','), '') AS cwes,
       |  CAST(epoch(TRY_CAST(pub AS TIMESTAMPTZ)) AS BIGINT)
       |    AS published_ep,
       |  'https://github.com/cisagov/vulnrichment/' || advisory_id AS url
       |FROM n ORDER BY advisory_id""".stripMargin

  // --- S2: EPSS daily CSV — preamble score_date + distributed CSV scan.

  private def epssSpark(s: SparkSession): DataFrame =
    EpssIngest.fromCsv(s, s"$Fix/epss/epss_scores_sample.csv")
      .select(col("cve"), col("score"), col("percentile"),
        col("published_at").cast("long").as("published_ep"))
      .orderBy("cve")

  private def epssOracle: String =
    s"""WITH lines AS (
       |  SELECT * FROM read_csv('$Fix/epss/epss_scores_sample.csv',
       |    columns={'line':'VARCHAR'}, delim='\\t', header=false)),
       |sd AS (
       |  SELECT regexp_extract(line, 'score_date:([^,]*)', 1) AS score_date
       |  FROM lines WHERE line LIKE '#%' LIMIT 1),
       |r AS (
       |  SELECT * FROM read_csv('$Fix/epss/epss_scores_sample.csv',
       |    skip=1, header=true,
       |    columns={'cve':'VARCHAR','epss':'VARCHAR',
       |             'percentile':'VARCHAR'}))
       |SELECT cve, CAST(epss AS DOUBLE) AS score,
       |  CAST(percentile AS DOUBLE) AS percentile,
       |  CAST(epoch(TRY_CAST((SELECT score_date FROM sd) AS TIMESTAMPTZ))
       |    AS BIGINT) AS published_ep
       |FROM r
       |WHERE cve IS NOT NULL AND epss IS NOT NULL
       |  AND percentile IS NOT NULL
       |ORDER BY cve""".stripMargin

  // --- S3: OVAL XML (oval_parser.py:1-198, lib_oval.py) — distributed
  // wholetext scan → namespace-aware DOM parse per document inside
  // mapPartitions. The oracle re-derives the same flat definition rows
  // from the same file with DuckDB regex extraction, which works because
  // the fixture (like real SUSE/Debian OVAL) keeps one element per line
  // and entity-free titles; the DOM parser is the general path.

  private def ovalSpark(s: SparkSession): DataFrame = {
    val raw = s.read.option("wholetext", "true")
      .text(s"$Fix/oval/suse_oval_sample.xml")
      .select(lit("suse_oval").as("datasource_id"),
        col("value").as("xml"))
    OvalIngest.parse(s, raw).toDF()
      .select(col("datasource_id"), col("definition_id"), col("title"),
        col("severity"),
        array_join(col("cves"), ",").as("cves_csv"),
        array_join(col("fixed_versions"), ",").as("fixed_csv"))
      .orderBy("definition_id")
  }

  private def ovalOracle: String =
    s"""WITH doc AS (
       |  SELECT content FROM read_text('$Fix/oval/suse_oval_sample.xml')),
       |defs AS (
       |  SELECT unnest(regexp_extract_all(content,
       |    '(?s)<definition .*?</definition>')) AS d
       |  FROM doc),
       |-- first-occurrence dedup mirrors OvalIngest.parse's .distinct
       |-- (a CVE commonly appears BOTH as <reference ref_id> and as an
       |-- advisory <cve> element in real SUSE OVAL): keep x only where
       |-- its first position in the list is its own index.
       |lists AS (
       |  SELECT d,
       |         list_concat(
       |           regexp_extract_all(d, 'ref_id="(CVE-[^"]*)"', 1),
       |           regexp_extract_all(d, '<cve[^>]*>(CVE-[^<]*)</cve>', 1))
       |           AS cves0,
       |         regexp_extract_all(d, 'earlier than ([0-9][^ "]*)', 1)
       |           AS fixed0
       |  FROM defs)
       |SELECT 'suse_oval' AS datasource_id,
       |       regexp_extract(d, '<definition[^>]* id="([^"]*)"', 1)
       |         AS definition_id,
       |       coalesce(regexp_extract(d, '<title>([^<]*)</title>', 1), '')
       |         AS title,
       |       coalesce(regexp_extract(d, '<severity>([^<]*)</severity>', 1),
       |         '') AS severity,
       |       coalesce(list_aggr(list_filter(cves0,
       |         (x, i) -> list_position(cves0, x) = i),
       |         'string_agg', ','), '') AS cves_csv,
       |       coalesce(list_aggr(list_filter(fixed0,
       |         (x, i) -> list_position(fixed0, x) = i),
       |         'string_agg', ','), '') AS fixed_csv
       |FROM lists ORDER BY definition_id""".stripMargin

  // --- S2/legacy: GSD JSON (importers/gsd.py:52-95) — the legacy-v1
  // family's oracle row. Aliases project as a SORTED distinct set (the
  // parser's order-preserving dedupe is pinned by LegacyImportersSpec
  // against the reference's captured expected files; sorting makes the
  // DuckDB re-derivation order-free), references in file order.

  private def gsdSpark(s: SparkSession): DataFrame = {
    // *.json on BOTH sides: a stray non-json file in the fixture dir
    // must stay invisible to Spark exactly as it is to the oracle glob
    val raw = s.read.option("wholetext", "true").text(s"$Fix/gsd/*.json")
      .select(lit("gsd").as("datasource_id"),
        input_file_name().as("path"), col("value").as("json"))
    graft.ingest.GsdIngest.parse(s, raw).toDF().select(
      col("advisory_id"), col("summary"),
      array_join(array_sort(array_distinct(col("aliases"))), ",")
        .as("aliases_csv"),
      joined(col("references"), r => r.getField("url")).as("ref_urls"),
      col("date_published").cast("long").as("published_ep"))
      .orderBy("advisory_id")
  }

  private def gsdOracle: String =
    s"""WITH raw AS (
       |  SELECT * FROM read_json('$Fix/gsd/*.json', filename=true,
       |    columns={'GSD':'JSON', 'namespaces':'JSON'})),
       |n AS (
       |  SELECT coalesce(json_extract_string(GSD, '$$.id'),
       |      regexp_extract(filename, '[^/]+$$', 0))
       |      AS advisory_id,
       |    json_extract_string(GSD, '$$.alias') AS alias,
       |    coalesce(json_extract_string(GSD, '$$.description'), '')
       |      AS gsd_desc,
       |    -- gsd.py:66 quirk: the references list lives under the
       |    -- EMPTY-STRING key of the GSD object. DuckDB's JSON path
       |    -- syntax cannot name an empty key, so go through a
       |    -- MAP(VARCHAR, JSON) transform and map_extract(m, '').
       |    coalesce(TRY_CAST(map_extract(json_transform(GSD,
       |      '"MAP(VARCHAR, JSON)"'), '')[1] AS VARCHAR[]), [])
       |      AS gsd_refs,
       |    json_extract_string(namespaces,
       |      '$$."cve.org".CVE_data_meta.ID') AS cve_id,
       |    coalesce(json_extract_string(namespaces,
       |      '$$."cve.org".CVE_data_meta.TITLE'), '') AS title,
       |    json_extract_string(namespaces,
       |      '$$."cve.org".source.advisory') AS adv,
       |    json_extract_string(namespaces,
       |      '$$."nvd.nist.gov".CVE_data_meta.ID') AS nvd_cve,
       |    json_extract_string(namespaces,
       |      '$$."nvd.nist.gov".source.advisory') AS nvd_adv,
       |    json_extract_string(namespaces,
       |      '$$."nvd.nist.gov".publishedDate') AS pub,
       |    coalesce(json_transform(json_extract(namespaces,
       |      '$$."cve.org".description.description_data'),
       |      '[{"lang":"VARCHAR","value":"VARCHAR"}]'), []) AS descs,
       |    coalesce(json_transform(json_extract(namespaces,
       |      '$$."cve.org".references.reference_data'),
       |      '[{"url":"VARCHAR"}]'), []) AS refs
       |  FROM raw),
       |b AS (
       |  SELECT *, trim(title) AS t,
       |    -- build_description(utils.py:326-339) over the GSD
       |    -- description or the joined eng cve.org descriptions
       |    trim(CASE WHEN gsd_desc <> '' THEN gsd_desc ELSE
       |      coalesce(list_aggr(list_transform(list_filter(descs,
       |        d -> d.lang = 'eng' AND d."value" IS NOT NULL
       |          AND d."value" <> ''),
       |        d -> d."value"), 'string_agg', ''), '') END) AS dd
       |  FROM n)
       |SELECT advisory_id,
       |  CASE WHEN dd = '' THEN t
       |       WHEN t <> '' AND strpos(dd, t) = 0 THEN t || chr(10) || dd
       |       ELSE dd END AS summary,
       |  array_to_string(list_sort(list_distinct(list_filter(
       |    [alias, advisory_id, cve_id, adv, nvd_cve, nvd_adv],
       |    x -> x IS NOT NULL AND x <> ''))), ',') AS aliases_csv,
       |  coalesce(array_to_string(
       |    list_concat(list_transform(refs, r -> r.url), gsd_refs), ';'),
       |    '') AS ref_urls,
       |  -- epoch(naive strptime) is tz-independent; the ::TIMESTAMPTZ
       |  -- cast form would read the session timezone
       |  CAST(coalesce(epoch(TRY_CAST(pub AS TIMESTAMPTZ)),
       |    epoch(try_strptime(pub, '%Y-%m-%dT%H:%MZ'))) AS BIGINT)
       |    AS published_ep
       |FROM b ORDER BY advisory_id""".stripMargin

  // --- S2/legacy: Ubuntu USN db (importers/ubuntu_usn.py:72-92) — one
  // JSON object keyed by USN id; every prefix-valid CVE fans out to its
  // own advisory carrying the USN reference. The bz2-wire + streaming
  // parse path is pinned by LegacyImportersSpec against the captured
  // reference db; this row gates the same mapping through DuckDB's
  // independent json_keys re-derivation on an uncompressed sample.

  private def usnSpark(s: SparkSession): DataFrame = {
    val raw = s.read.option("wholetext", "true")
      .text(s"$Fix/usn/database-sample.json")
      .select(lit("ubuntu_usn").as("datasource_id"),
        col("value").as("text"))
    graft.ingest.UbuntuUsnIngest.parse(s, raw).toDF().select(
      col("advisory_id"),
      array_join(col("aliases"), ",").as("aliases_csv"),
      joined(col("references"), r => r.getField("reference_id"))
        .as("ref_ids"),
      col("url"))
      .orderBy("advisory_id")
  }

  private def usnOracle: String =
    s"""WITH raw AS (
       |  SELECT json FROM read_json_objects(
       |    '$Fix/usn/database-sample.json', format='unstructured')),
       |entries AS (
       |  SELECT k AS usn_key, json_extract(json, '$$."' || k || '"')
       |    AS entry
       |  FROM raw, unnest(json_keys(json)) AS t(k)),
       |flat AS (
       |  SELECT usn_key,
       |    json_extract_string(entry, '$$.id') AS id,
       |    unnest(coalesce(CAST(json_extract(entry, '$$.cves')
       |      AS VARCHAR[]), [])) AS cve
       |  FROM entries)
       |SELECT 'usn-' || coalesce(id, usn_key) || '-' || cve AS advisory_id,
       |  cve AS aliases_csv,
       |  CASE WHEN id IS NOT NULL THEN 'USN-' || id ELSE '' END AS ref_ids,
       |  CASE WHEN id IS NOT NULL
       |       THEN 'https://usn.ubuntu.com/' || id || '/'
       |       ELSE 'https://usn.ubuntu.com/usn-db/database-all.json.bz2'
       |       END AS url
       |FROM flat
       |WHERE regexp_matches(cve, '^(?i)CVE-[0-9]{4}-[0-9]{4,19}')
       |ORDER BY advisory_id""".stripMargin

  override val entries: Seq[QueryEntry] = Seq(
    q("i1_advisory_tree", advisoryTreeOracle) { (s, _) =>
      advisoryTreeSpark(s)
    },
    q("i2_osv_tree", osvTreeOracle) { (s, _) => osvTreeSpark(s) },
    q("i3_vulnrichment", vulnrichmentOracle) { (s, _) =>
      vulnrichmentSpark(s)
    },
    q("i4_epss_csv", epssOracle) { (s, _) => epssSpark(s) },
    q("i5_oval", ovalOracle) { (s, _) => ovalSpark(s) },
    q("i6_gsd", gsdOracle) { (s, _) => gsdSpark(s) },
    q("i7_ubuntu_usn", usnOracle) { (s, _) => usnSpark(s) },
  )
}
