package graft.model

import java.sql.Timestamp

/** Typed advisory data model — the Spark re-expression of the reference's
  * V2 "advisory-centric" schema (SURVEY §1.3).
  *
  * Nested children (aliases/references/severities/affected) live as array
  * columns on the advisory row — the Spark-native analog of the
  * reference's JSONField design ("processed as a whole by an improver",
  * models.py:1387-1395) — and are exploded into normalized link tables by
  * the derive jobs when relational access is needed.
  */
final case class ReferenceRow(
    url: String,
    reference_type: String, // advisory|exploit|mailing_list|bug|other
    reference_id: String)

final case class SeverityRow(
    scoring_system: String, // cvssv3.1, epss, generic_textual, ...
    value: String,
    scoring_elements: String, // e.g. CVSS vector
    url: String)

final case class AffectedRow(
    purl: String,           // base purl (no version)
    affecting_vers: String, // vers: range of affected versions
    fixed_vers: String)     // vers: range/pins of fixed versions

/** One collected advisory version (AdvisoryV2, models.py:3123-3367). */
final case class AdvisoryRow(
    datasource_id: String,
    advisory_id: String,
    summary: String,
    aliases: Seq[String],
    references: Seq[ReferenceRow],
    severities: Seq[SeverityRow],
    weaknesses: Seq[Int],
    affected: Seq[AffectedRow],
    date_collected: Timestamp,
    date_published: Option[Timestamp],
    url: String,
    precedence: Int) {
  def avid: String = s"$datasource_id/$advisory_id"
}

/** Concrete package version (PackageV2, models.py:3720-3896). */
final case class PackageRow(
    purl: String,       // versioned purl
    base_purl: String,  // purl without version
    ptype: String,
    namespace: String,
    name: String,
    version: String)

/** One impact = (advisory, base purl, ranges) (ImpactedPackage,
  * models.py:3370-3470). */
final case class ImpactRow(
    avid: String,
    base_purl: String,
    affecting_vers: String,
    fixed_vers: String)
