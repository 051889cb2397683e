package graft.export

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FederatedCode-style export sink (SURVEY S7 + T2).
  *
  * Re-expresses the full `serialize_advisory` schema (pipes/export.py:
  * 109-170: aliases, impacted packages with affected/fixed vers and
  * fixed/introduced commit lists, severities, weaknesses, references)
  * plus the per-package advisory index (`get_package_related_advisory`,
  * pipes/export.py:79-96) as column expressions over the derived marts.
  * Spark-first shape: serialization is one projection (whole-stage
  * codegen), sharding is a partitioned write — no driver-side file
  * loop, no git subprocess (the reference's clone/commit/push plumbing,
  * federate_vulnerabilities.py:70-140, is a driver-side boundary in
  * both systems).
  *
  * Differences from the reference, both deliberate:
  *   - shard = first 2 hex chars of sha256(avid) (the reference shards
  *     through its federation config; any stable hash bounds
  *     per-directory file counts — sha256 is reproducible in every
  *     engine this export is checked against);
  *   - list order inside a document is canonicalized (aliases sorted as
  *     in export.py:139, impacts sorted by purl, commit lists sorted)
  *     so a re-export of unchanged data is byte-identical — prefetch
  *     iteration order is not a contract worth preserving.
  */
object FederatedExport {

  /** YAML scalar: double-quoted with backslash/quote/newline/CR/tab
    * escapes (JSON-style escapes are valid YAML double-quoted flow
    * scalars, so multi-line summaries survive one-line rendering).
    * \r matters in practice: CRLF-sourced advisory text would otherwise
    * emit a literal carriage return inside the scalar and break the
    * one-scalar-per-line document layout the serializer assumes. */
  private[export] def yamlQuote(c: Column): Column =
    concat(lit("\""),
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(
          coalesce(c, lit("")),
          "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"),
        "\r", "\\\\r"), "\t", "\\\\t"),
      lit("\""))

  /** List body: inline ` []` when empty, else newline + joined items.
    * Items must not carry a trailing newline. */
  private[export] def listBody(items: Column): Column =
    when(items.isNull || size(items) === 0, lit(" []"))
      .otherwise(concat(lit("\n"), array_join(items, "\n")))

  private def patchList(arr: Column, indent: String): Column =
    listBody(transform(sort_array(arr), p => concat(
      lit(indent + "- vcs_url: "), yamlQuote(p.getField("vcs_url")),
      lit("\n" + indent + "  commit: "), yamlQuote(p.getField("commit_hash")))))

  /** Full-schema advisory documents: (shard, path, yaml) plus the
    * structural columns (advisory_id, n_impacts, n_severities,
    * n_references, n_weaknesses) the driver oracle checks.
    *
    * `commitPatches` (optional): (avid, purl, vcs_url, commit_hash,
    * kind) with kind ∈ {fixed, introduced} — the per-impact commit
    * lists of export.py:127-134. */
  def serialize(advisories: DataFrame,
      commitPatches: Option[DataFrame] = None): DataFrame = {
    val latest = advisories.filter(col("is_latest"))
    val spark = advisories.sparkSession
    val patches = commitPatches.getOrElse {
      import spark.implicits._
      Seq.empty[(String, String, String, String, String)]
        .toDF("avid", "purl", "vcs_url", "commit_hash", "kind")
    }
    val patchAgg = patches.groupBy("avid", "purl")
      .agg(
        collect_list(when(col("kind") === "fixed",
          struct(col("vcs_url"), col("commit_hash")))).as("fixed_p"),
        collect_list(when(col("kind") === "introduced",
          struct(col("vcs_url"), col("commit_hash")))).as("intro_p"))
    val imp = latest
      .select(col("avid"), explode(col("affected")).as("i"))
      .join(patchAgg,
        latest("avid") === patchAgg("avid") &&
          col("i.purl") === patchAgg("purl"), "left")
      .select(latest("avid"),
        struct(col("i.purl").as("purl"), concat(
          lit("  - purl: "), yamlQuote(col("i.purl")),
          lit("\n    affected_versions: "),
          yamlQuote(col("i.affecting_vers")),
          lit("\n    fixed_versions: "), yamlQuote(col("i.fixed_vers")),
          lit("\n    fixed_in_commits:"),
          patchList(coalesce(col("fixed_p"), array()), "      "),
          lit("\n    introduced_in_commits:"),
          patchList(coalesce(col("intro_p"), array()), "      "))
          .as("item")).as("rendered"))
      .groupBy("avid")
      .agg(sort_array(collect_list(col("rendered"))).as("imps"))
      .select(col("avid").as("_avid"),
        transform(col("imps"), r => r.getField("item")).as("imp_items"),
        size(col("imps")).as("n_impacts"))
    val sevItems = transform(col("severities"), s => concat(
      lit("  - score: "), yamlQuote(s.getField("value")),
      lit("\n    scoring_system: "), yamlQuote(s.getField("scoring_system")),
      lit("\n    scoring_elements: "),
      yamlQuote(s.getField("scoring_elements")),
      // the normalized SeverityRow keeps the severity URL, not the
      // per-severity publication time (export.py:109-117 emits both);
      // published_at is null until the ingest schema carries it through
      lit("\n    published_at: null"),
      lit("\n    url: "), yamlQuote(s.getField("url"))))
    val refItems = transform(col("references"), r => concat(
      lit("  - url: "), yamlQuote(r.getField("url")),
      lit("\n    reference_type: "), yamlQuote(r.getField("reference_type")),
      lit("\n    reference_id: "), yamlQuote(r.getField("reference_id"))))
    // the reference serializes Weakness.cwe, the "CWE-<id>" rendering
    // (export.py:141 via models.py:560-561) — pinned by the captured
    // federate_vulnerabilities golden ("CWE-707", "CWE-20")
    val weakItems = transform(col("weaknesses"),
      w => concat(lit("  - CWE-"), w.cast("string")))
    val aliasItems = transform(array_sort(col("aliases")),
      a => concat(lit("  - "), yamlQuote(a)))
    latest.join(imp, latest("avid") === imp("_avid"), "left")
      .select(
        substring(sha2(col("avid"), 256), 1, 2).as("shard"),
        concat(substring(sha2(col("avid"), 256), 1, 2), lit("/"),
          regexp_replace(col("avid"), "/", "_"), lit(".yml")).as("path"),
        concat(
          lit("advisory_id: "), yamlQuote(col("advisory_id")),
          // the reference keys the avid as "datasource_id" and the
          // advisory URL as "datasource_url" (export.py:158-160) —
          // kept verbatim for drop-in consumers
          lit("\ndatasource_id: "), yamlQuote(col("avid")),
          lit("\ndatasource_url: "), yamlQuote(col("url")),
          lit("\naliases:"), listBody(aliasItems),
          lit("\nsummary: "), yamlQuote(col("summary")),
          lit("\nimpacted_packages:"),
          listBody(coalesce(col("imp_items"), array())),
          lit("\nseverities:"), listBody(sevItems),
          lit("\nweaknesses:"), listBody(weakItems),
          lit("\nreferences:"), listBody(refItems),
          lit("\n")).as("yaml"),
        col("advisory_id"),
        coalesce(col("n_impacts"), lit(0)).as("n_impacts"),
        // size() returns -1 on a null array; the rendered YAML shows
        // '[]' for those rows, so the counts must say 0 like n_impacts
        greatest(size(col("severities")), lit(0)).as("n_severities"),
        greatest(size(col("references")), lit(0)).as("n_references"),
        greatest(size(col("weaknesses")), lit(0)).as("n_weaknesses"))
  }

  /** Per-package advisory index (export.py:79-96): one document per
    * concrete package listing the avids affecting / fixing it, sorted.
    * Input: the unfurled mart (avid, base_purl, version, is_affected,
    * is_fixed). */
  def packageIndex(unfurled: DataFrame): DataFrame = {
    val agg = unfurled.groupBy("base_purl", "version")
      .agg(
        sort_array(collect_set(when(col("is_affected"), col("avid"))))
          .as("affected_by"),
        sort_array(collect_set(when(col("is_fixed"), col("avid"))))
          .as("fixing"))
      .withColumn("purl",
        concat(col("base_purl"), lit("@"), col("version")))
    agg.select(
      col("purl"),
      substring(sha2(col("purl"), 256), 1, 2).as("shard"),
      concat(lit("packages/"), substring(sha2(col("purl"), 256), 1, 2),
        lit("/"), regexp_replace(col("purl"), "[/@:]", "_"), lit(".yml"))
        .as("path"),
      concat(
        lit("- purl: "), yamlQuote(col("purl")),
        lit("\n  affected_by_advisories:"),
        listBody(transform(col("affected_by"),
          a => concat(lit("    - "), yamlQuote(a)))),
        lit("\n  fixing_advisories:"),
        listBody(transform(col("fixing"),
          a => concat(lit("    - "), yamlQuote(a)))),
        lit("\n")).as("yaml"),
      array_join(col("affected_by"), ",").as("affected_csv"),
      array_join(col("fixing"), ",").as("fixing_csv"))
  }

  /** Incremental selection past the export checkpoint (pipes/export.py:
    * 58-76): only advisories collected after the last run. */
  def changedSince(advisories: DataFrame,
      checkpoint: java.sql.Timestamp): DataFrame =
    advisories.filter(col("date_collected") >= lit(checkpoint))

  /** Write an export tree: one text file set per shard directory. */
  def write(serialized: DataFrame, outDir: String): Unit =
    serialized.select(col("shard"), col("yaml"))
      .write.mode("overwrite").partitionBy("shard").text(outDir)
}
