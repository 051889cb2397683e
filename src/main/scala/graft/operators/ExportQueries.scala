package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.export.{FederatedExport, V1Export}

/** SURVEY §2 S7 driver-oracle coverage — the federated export run
  * through the REAL serialize/packageIndex paths over synthetic
  * advisories, with DuckDB re-deriving the sharding (sha256 prefix) and
  * the structural document columns. The YAML bodies themselves are
  * golden-file-pinned in FederatedExportSpec (a string the oracle
  * cannot cheaply re-render); the oracle checks paths, shards, and
  * every per-document collection cardinality, so a dropped impact or
  * severity list still fails the gate. */
object ExportQueries extends QueryModule {

  private def advisories(s: SparkSession, dir: String): DataFrame = {
    val sevType = "array<struct<scoring_system:string,value:string," +
      "scoring_elements:string,url:string>>"
    val refType = "array<struct<url:string,reference_type:string," +
      "reference_id:string>>"
    Tables(s, dir, "orders")
      .select(pmod(col("o_orderkey"), lit(300)).as("k")).distinct()
      .select(
        concat(lit("exp/"), col("k")).as("avid"),
        concat(lit("E-"), col("k")).as("advisory_id"),
        lit(true).as("is_latest"),
        concat(lit("sum "), col("k")).as("summary"),
        concat(lit("https://u/"), col("k")).as("url"),
        array(concat(lit("CVE-"), col("k"))).as("aliases"),
        when(pmod(col("k"), lit(3)) === 0, array(
          struct(lit("cvssv3.1").as("scoring_system"),
            pmod(col("k"), lit(10)).cast("string").as("value"),
            lit("CVSS:3.1/X").as("scoring_elements"),
            concat(lit("https://nvd.example/"), col("k")).as("url"))))
          .otherwise(expr(s"CAST(array() AS $sevType)")).as("severities"),
        when(pmod(col("k"), lit(4)) === 0, array(
          struct(concat(lit("https://ref/"), col("k")).as("url"),
            lit("advisory").as("reference_type"),
            concat(lit("R-"), col("k")).as("reference_id"))))
          .otherwise(expr(s"CAST(array() AS $refType)")).as("references"),
        when(pmod(col("k"), lit(5)) === 0, array(lit(79), lit(89)))
          .otherwise(expr("CAST(array() AS array<int>)")).as("weaknesses"),
        when(pmod(col("k"), lit(2)) === 0, array(
          struct(concat(lit("pkg:npm/a"), pmod(col("k"), lit(7)))
            .as("purl"),
            lit("vers:npm/>=1").as("affecting_vers"),
            lit("vers:npm/2").as("fixed_vers")),
          struct(concat(lit("pkg:npm/b"), pmod(col("k"), lit(5)))
            .as("purl"),
            lit("vers:npm/<1").as("affecting_vers"),
            lit("").as("fixed_vers"))))
          .otherwise(array(
            struct(concat(lit("pkg:npm/a"), pmod(col("k"), lit(7)))
              .as("purl"),
              lit("vers:npm/>=1").as("affecting_vers"),
              lit("vers:npm/2").as("fixed_vers")))).as("affected"))
  }

  private val unfurledSql =
    """u AS (SELECT 'exp/' || CAST(l_orderkey % 300 AS VARCHAR) AS avid,
      |       'pkg:npm/p' || CAST(l_partkey % 20 AS VARCHAR) AS base_purl,
      |       CAST(l_linenumber AS VARCHAR) AS version,
      |       l_quantity > 25 AS is_affected,
      |       l_quantity <= 25 AS is_fixed
      |FROM lineitem)""".stripMargin

  private def unfurled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      concat(lit("exp/"), pmod(col("l_orderkey"), lit(300))).as("avid"),
      concat(lit("pkg:npm/p"), pmod(col("l_partkey"), lit(20)))
        .as("base_purl"),
      col("l_linenumber").cast("string").as("version"),
      (col("l_quantity") > 25).as("is_affected"),
      (col("l_quantity") <= 25).as("is_fixed"))

  override val entries: Seq[QueryEntry] = Seq(

    // S7 — full advisory document export: sharded path layout plus the
    // per-document collection cardinalities of serialize_advisory
    // (export.py:137-170)
    q("e1_export_rows",
      """WITH o AS (SELECT DISTINCT o_orderkey % 300 AS k FROM orders)
        |SELECT substr(sha256('exp/' || CAST(k AS VARCHAR)), 1, 2) AS shard,
        |       substr(sha256('exp/' || CAST(k AS VARCHAR)), 1, 2) || '/' ||
        |         'exp_' || CAST(k AS VARCHAR) || '.yml' AS path,
        |       'E-' || CAST(k AS VARCHAR) AS advisory_id,
        |       CASE WHEN k % 2 = 0 THEN 2 ELSE 1 END AS n_impacts,
        |       CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END AS n_severities,
        |       CASE WHEN k % 4 = 0 THEN 1 ELSE 0 END AS n_references,
        |       CASE WHEN k % 5 = 0 THEN 2 ELSE 0 END AS n_weaknesses
        |FROM o ORDER BY path""") { (s, dir) =>
      FederatedExport.serialize(advisories(s, dir))
        .select("shard", "path", "advisory_id", "n_impacts",
          "n_severities", "n_references", "n_weaknesses")
        .orderBy("path")
    },

    // S7 — per-package advisory index (export.py:79-96): sorted avid
    // lists per concrete package, sharded like the documents
    q("e2_package_index",
      s"""WITH $unfurledSql,
         |agg AS (
         |  SELECT base_purl, version,
         |         string_agg(DISTINCT CASE WHEN is_affected THEN avid END,
         |                    ',' ORDER BY CASE WHEN is_affected THEN avid END)
         |           AS affected_csv,
         |         string_agg(DISTINCT CASE WHEN is_fixed THEN avid END,
         |                    ',' ORDER BY CASE WHEN is_fixed THEN avid END)
         |           AS fixing_csv
         |  FROM u GROUP BY base_purl, version)
         |SELECT base_purl || '@' || version AS purl,
         |       substr(sha256(base_purl || '@' || version), 1, 2) AS shard,
         |       coalesce(affected_csv, '') AS affected_csv,
         |       coalesce(fixing_csv, '') AS fixing_csv
         |FROM agg ORDER BY purl""") { (s, dir) =>
      FederatedExport.packageIndex(unfurled(s, dir))
        .select("purl", "shard", "affected_csv", "fixing_csv")
        .orderBy("purl")
    },

    // S7 — v1 export-command package documents (export.py:110-155 +
    // aboutcode hashid tiered sharding): DuckDB re-derives the full
    // purls.yml / vulnerabilities.yml bodies AND the tiered purl-hash
    // paths (sha256 low bits mod 2^tier, hex) so a sharding or
    // rendering drift fails the gate. Types span all four tiers
    // (npm=10, pypi=7, gem=5, cargo=0 bits).
    q("e3_v1_package_docs",
      """WITH p AS (
        |  SELECT ['npm','pypi','gem','cargo'][(p_partkey % 4) + 1] AS ptype,
        |         CASE WHEN p_partkey % 2 = 0 THEN NULL
        |              ELSE 'ns' || CAST(p_partkey % 3 AS VARCHAR) END AS ns,
        |         'p' || CAST(p_partkey % 40 AS VARCHAR) AS name,
        |         CAST(p_size % 9 AS VARCHAR) AS version,
        |         p_size % 9 AS version_rank
        |  FROM part),
        |v AS (
        |  SELECT ptype, ns, name, version, version_rank,
        |         'pkg:' || ptype || '/' ||
        |           CASE WHEN ns IS NULL THEN name
        |                ELSE ns || '/' || name END ||
        |           '@' || version AS purl,
        |         CASE WHEN version_rank % 2 = 0
        |              THEN '    - "V' || version || '"' END AS aff_line,
        |         CASE WHEN version_rank % 3 = 0
        |              THEN '    - "F' || version || '"' END AS fix_line
        |  FROM p),
        |items AS (
        |  SELECT ptype, ns, name, version_rank, purl,
        |         '- purl: "' || purl || '"' ||
        |         chr(10) || '  affected_by_vulnerabilities:' ||
        |         CASE WHEN aff_line IS NULL THEN ' []'
        |              ELSE chr(10) || aff_line END ||
        |         chr(10) || '  fixing_vulnerabilities:' ||
        |         CASE WHEN fix_line IS NULL THEN ' []'
        |              ELSE chr(10) || fix_line END AS item
        |  FROM v),
        |docs AS (
        |  SELECT ptype, ns, name,
        |         string_agg('- "' || purl || '"', chr(10)
        |                    ORDER BY version_rank, purl) || chr(10)
        |           AS purls_yaml,
        |         string_agg(item, chr(10)
        |                    ORDER BY version_rank, purl) || chr(10)
        |           AS vulnerabilities_yaml
        |  FROM items GROUP BY ptype, ns, name),
        |sharded AS (
        |  SELECT *,
        |         'pkg:' || ptype || '/' ||
        |           CASE WHEN ns IS NULL THEN name
        |                ELSE ns || '/' || name END AS core,
        |         CASE ptype WHEN 'npm' THEN 10 WHEN 'pypi' THEN 7
        |              WHEN 'gem' THEN 5 ELSE 0 END AS bits
        |  FROM docs),
        |pathed AS (
        |  SELECT *,
        |         'aboutcode-packages-' || ptype || '-' ||
        |           lpad(lower(format('{:x}',
        |                  CAST(('0x' || substring(sha256(core), 57, 8))
        |                       AS BIGINT) % CAST(pow(2, bits) AS BIGINT))),
        |                  CAST(greatest(1, ceil(bits / 4.0)) AS INT), '0') ||
        |           '/' || ptype || '/' ||
        |           CASE WHEN ns IS NULL THEN name
        |                ELSE ns || '/' || name END AS base_dir
        |  FROM sharded)
        |SELECT base_dir, base_dir || '/purls.yml' AS purls_path,
        |       purls_yaml,
        |       base_dir || '/vulnerabilities.yml' AS vulnerabilities_path,
        |       vulnerabilities_yaml
        |FROM pathed ORDER BY base_dir""") { (s, dir) =>
      val in = Tables(s, dir, "part").select(
        element_at(array(lit("npm"), lit("pypi"), lit("gem"),
          lit("cargo")), (pmod(col("p_partkey"), lit(4)) + 1).cast("int"))
          .as("ptype"),
        when(pmod(col("p_partkey"), lit(2)) === 0,
          lit(null).cast("string"))
          .otherwise(concat(lit("ns"), pmod(col("p_partkey"), lit(3))))
          .as("namespace"),
        concat(lit("p"), pmod(col("p_partkey"), lit(40))).as("name"),
        pmod(col("p_size"), lit(9)).as("version_rank"))
        .withColumn("purl", concat(lit("pkg:"), col("ptype"), lit("/"),
          when(col("namespace").isNull, col("name"))
            .otherwise(concat(col("namespace"), lit("/"), col("name"))),
          lit("@"), col("version_rank"))) // version string == rank
        .withColumn("affected_by",
          when(pmod(col("version_rank"), lit(2)) === 0,
            array(concat(lit("V"), col("version_rank"))))
            .otherwise(expr("CAST(array() AS array<string>)")))
        .withColumn("fixing",
          when(pmod(col("version_rank"), lit(3)) === 0,
            array(concat(lit("F"), col("version_rank"))))
            .otherwise(expr("CAST(array() AS array<string>)")))
      V1Export.packageDocs(in)
        .select("base_dir", "purls_path", "purls_yaml",
          "vulnerabilities_path", "vulnerabilities_yaml")
        .orderBy("base_dir")
    },

    // S7 — v1 export-command vulnerability documents (export.py:38-62,
    // hashid vulnerability_yml_path): DuckDB re-renders the complete
    // document (str(None) publication time, CWE-prefixed weaknesses)
    // and the uid-sharded path.
    q("e4_v1_vuln_docs",
      """WITH o AS (SELECT DISTINCT o_orderkey % 300 AS k FROM orders),
        |v AS (
        |  SELECT 'VCID-k' || CAST(k AS VARCHAR) || '-aaaa-aaab' AS vcid,
        |         k FROM o)
        |SELECT vcid AS vulnerability_id,
        |       'aboutcode-vulnerabilities/' || substring(vcid, 6, 2) ||
        |         '/' || vcid || '.yml' AS path,
        |       'vulnerability_id: "' || vcid || '"' ||
        |       chr(10) || 'aliases:' ||
        |       chr(10) || '  - "CVE-' || CAST(k AS VARCHAR) || '"' ||
        |       chr(10) || 'summary: "s' || CAST(k AS VARCHAR) || '"' ||
        |       chr(10) || 'severities:' ||
        |       CASE WHEN k % 3 = 0 THEN
        |         chr(10) || '  - score: "' || CAST(k % 10 AS VARCHAR) ||
        |         '"' ||
        |         chr(10) || '    scoring_system: "cvssv3.1"' ||
        |         chr(10) || '    scoring_elements: "CVSS:3.1/X"' ||
        |         chr(10) || '    published_at: "None"' ||
        |         chr(10) || '    url: "https://s/' || CAST(k AS VARCHAR)
        |           || '"'
        |       ELSE ' []' END ||
        |       chr(10) || 'weaknesses:' ||
        |       CASE WHEN k % 5 = 0
        |            THEN chr(10) || '  - CWE-79' || chr(10) || '  - CWE-89'
        |            ELSE ' []' END ||
        |       chr(10) || 'references:' ||
        |       CASE WHEN k % 4 = 0 THEN
        |         chr(10) || '  - url: "https://r/' || CAST(k AS VARCHAR)
        |           || '"' ||
        |         chr(10) || '    reference_type: "advisory"' ||
        |         chr(10) || '    reference_id: "R-' || CAST(k AS VARCHAR)
        |           || '"'
        |       ELSE ' []' END || chr(10) AS yaml
        |FROM v ORDER BY path""") { (s, dir) =>
      val sevType = "array<struct<scoring_system:string,value:string," +
        "scoring_elements:string,url:string>>"
      val refType = "array<struct<url:string,reference_type:string," +
        "reference_id:string>>"
      val in = Tables(s, dir, "orders")
        .select(pmod(col("o_orderkey"), lit(300)).as("k")).distinct()
        .select(
          concat(lit("VCID-k"), col("k"), lit("-aaaa-aaab"))
            .as("vulnerability_id"),
          array(concat(lit("CVE-"), col("k"))).as("aliases"),
          concat(lit("s"), col("k")).as("summary"),
          when(pmod(col("k"), lit(3)) === 0, array(
            struct(lit("cvssv3.1").as("scoring_system"),
              pmod(col("k"), lit(10)).cast("string").as("value"),
              lit("CVSS:3.1/X").as("scoring_elements"),
              concat(lit("https://s/"), col("k")).as("url"))))
            .otherwise(expr(s"CAST(array() AS $sevType)"))
            .as("severities"),
          when(pmod(col("k"), lit(5)) === 0, array(lit(79), lit(89)))
            .otherwise(expr("CAST(array() AS array<int>)"))
            .as("weaknesses"),
          when(pmod(col("k"), lit(4)) === 0, array(
            struct(concat(lit("https://r/"), col("k")).as("url"),
              lit("advisory").as("reference_type"),
              concat(lit("R-"), col("k")).as("reference_id"))))
            .otherwise(expr(s"CAST(array() AS $refType)"))
            .as("references"))
      V1Export.vulnerabilityDocs(in)
        .select("vulnerability_id", "path", "yaml")
        .orderBy("path")
    },

    // S7 — purl2cpe dump (management/commands/purl2cpe.py:30-64): per
    // vulnerability with ≥1 related package AND ≥1 CPE reference, the
    // (cves, purls, cpes) document, one row per CVE alias with its
    // year (the dump appends the doc once per CVE). Groups k%5=0 carry
    // no CPE refs and k%7=0 no purls — both must drop; non-CVE aliases
    // and non-cpe reference ids must filter out of the lists.
    q("e5_purl2cpe",
      """WITH b AS (
        |  SELECT p_partkey, p_partkey % 50 AS k,
        |         'CVE-' || CAST(2015 + p_partkey % 8 AS VARCHAR) || '-' ||
        |           CAST(p_partkey % 20 AS VARCHAR) AS cve,
        |         CASE WHEN p_partkey % 2 = 0 AND (p_partkey % 50) % 5 <> 0
        |              THEN 'cpe:2.3:a:v' || CAST(p_partkey % 7 AS VARCHAR)
        |              END AS cpe,
        |         CASE WHEN (p_partkey % 50) % 7 <> 0
        |              THEN 'pkg:npm/p' || CAST(p_partkey % 30 AS VARCHAR)
        |                || '@1' END AS purl
        |  FROM part),
        |g AS (
        |  SELECT k,
        |         list_sort(list_distinct(list(cve))) AS cves,
        |         list_sort(list_distinct(list(cpe)
        |           FILTER (WHERE cpe IS NOT NULL))) AS cpes,
        |         list_sort(list_distinct(list(purl)
        |           FILTER (WHERE purl IS NOT NULL))) AS purls
        |  FROM b GROUP BY k),
        |e AS (
        |  SELECT 'VCID-' || CAST(k AS VARCHAR) AS vulnerablecode_id,
        |         cves, purls, cpes, unnest(cves) AS cve
        |  FROM g WHERE len(cpes) > 0 AND len(purls) > 0)
        |SELECT string_split(cve, '-')[2] AS year, cve, vulnerablecode_id,
        |       array_to_string(cves, ',') AS cves,
        |       array_to_string(purls, ',') AS purls,
        |       array_to_string(cpes, ',') AS cpes
        |FROM e ORDER BY year, cve, vulnerablecode_id""") { (s, dir) =>
      val k = pmod(col("p_partkey"), lit(50))
      val grain = Tables(s, dir, "part")
        .select(col("p_partkey"), k.as("k"))
        .groupBy("k")
        .agg(
          // CVE aliases + GHSA noise the engine must filter out
          array_union(
            collect_set(concat(lit("CVE-"),
              (lit(2015) + pmod(col("p_partkey"), lit(8))).cast("string"),
              lit("-"), pmod(col("p_partkey"), lit(20)).cast("string"))),
            collect_set(when(pmod(col("p_partkey"), lit(3)) === 0,
              concat(lit("GHSA-"),
                pmod(col("p_partkey"), lit(5)).cast("string")))))
            .as("aliases"),
          // cpe ids + plain-url reference ids the engine must filter out
          array_union(
            collect_set(when(pmod(col("p_partkey"), lit(2)) === 0 &&
              pmod(col("k"), lit(5)) =!= 0,
              concat(lit("cpe:2.3:a:v"),
                pmod(col("p_partkey"), lit(7)).cast("string")))),
            collect_set(concat(lit("https://ref/"),
              col("p_partkey").cast("string")))).as("reference_ids"),
          collect_set(when(pmod(col("k"), lit(7)) =!= 0,
            concat(lit("pkg:npm/p"),
              pmod(col("p_partkey"), lit(30)).cast("string"), lit("@1"))))
            .as("purls"))
        .select(concat(lit("VCID-"), col("k")).as("vulnerability_id"),
          col("aliases"), col("reference_ids"), col("purls"))
      V1Export.purl2cpe(grain)
        .select(col("year"), col("cve"), col("vulnerablecode_id"),
          array_join(col("cves"), ",").as("cves"),
          array_join(col("purls"), ",").as("purls"),
          array_join(col("cpes"), ",").as("cpes"))
        .orderBy("year", "cve", "vulnerablecode_id")
    },
  )
}
