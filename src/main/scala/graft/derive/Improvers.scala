package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, Vers}

/** The improver family — advisory data → full-confidence inferences
  * (improvers/default.py DefaultImprover + improvers/valid_versions.py
  * ValidVersionImprover), re-expressed as set-at-a-time derivations.
  *
  * The reference improves one advisory at a time in Python; here one
  * DataFrame pass derives every advisory's inferences at once:
  *
  *  - [[defaultInferences]] needs only the impact rows themselves
  *    (constraint-endpoint expansion — per-row array work, map-only);
  *  - [[validVersionInferences]] joins the advisory impacts against the
  *    corpus-scale versions dimension, with range containment through
  *    the codegen'd version_in_range path and the nearest-fix assignment
  *    as one window per (impact, package) group — the reference's
  *    per-advisory `bisect_right` loop becomes a single sorted-window
  *    `last(unaffected)` lookback, so no driver-side iteration and no
  *    per-advisory version fetch.
  *
  * Inference rows are uniform across both: (avid, ptype, namespace,
  * name, qualifiers, affected_versions, fixed_version, confidence);
  * advisory-level facets (aliases/summary/references/weaknesses) stay on
  * the advisory table and join by avid at serving time — exactly the
  * reference's Inference.from_advisory_data copy-through.
  */
object Improvers {

  val MaxConfidence = 100

  private val resolvedEndpointsUdf = udf { (spec: String) =>
    if (spec == null || spec.trim.isEmpty) Seq.empty[String]
    else try Vers.resolvedConstraintVersions(spec)
    catch { case _: Exception => Seq.empty[String] }
  }

  private val excludedEndpointsUdf = udf { (spec: String) =>
    if (spec == null || spec.trim.isEmpty) Seq.empty[String]
    else try Vers.exactVersions(spec)._2
    catch { case _: Exception => Seq.empty[String] }
  }

  // get_exact_purls emits `str(version)` on univers objects — the
  // scheme-aware canonical rendering (VersionOrd.render; apache
  // four-segment → +build is the one non-identity family)
  private val renderSeqUdf = udf { (scheme: String, vs: Seq[String]) =>
    Option(vs).getOrElse(Seq.empty)
      .map(v => graft.functions.VersionOrd.render(scheme, v))
  }
  private val renderUdf = udf { (scheme: String, v: String) =>
    if (v == null) null else graft.functions.VersionOrd.render(scheme, v)
  }

  /** DefaultImprover.get_inferences (improvers/default.py:52-85) +
    * get_exact_purls (:88-141): disregard ranges except for their exact
    * endpoints.
    *
    *  - affected = constraint endpoints that satisfy their own range;
    *  - fixed = `!=` excluded endpoints plus the explicit fixed_version;
    *  - one inference per fixed version (affected list repeated), or a
    *    single fixed-less inference when none;
    *  - an advisory with no impact rows yields one empty inference.
    *
    * Qualifiers ride through untouched on both sides
    * (utils.update_purl_version keeps every purl field).
    *
    * @param advisories (avid) — one row per advisory
    * @param impacts (avid, ptype, namespace, name, qualifiers,
    *                affecting_vers, fixed_version)
    */
  def defaultInferences(advisories: DataFrame, impacts: DataFrame): DataFrame = {
    val scheme = coalesce(
      nullif(regexp_extract(col("affecting_vers"), "^vers:([^/]+)/", 1),
        lit("")),
      col("ptype"))
    val perImpact = impacts
      .withColumn("affected_versions",
        renderSeqUdf(scheme, resolvedEndpointsUdf(col("affecting_vers"))))
      .withColumn("fixed_versions", renderSeqUdf(scheme, concat(
        excludedEndpointsUdf(col("affecting_vers")),
        when(col("fixed_version").isNotNull &&
          length(col("fixed_version")) > 0, array(col("fixed_version")))
          .otherwise(array().cast("array<string>")))))
    val exploded = perImpact.select(col("avid"), col("ptype"),
      col("namespace"), col("name"), col("qualifiers"),
      col("affected_versions"),
      explode_outer(when(size(col("fixed_versions")) > 0,
        col("fixed_versions"))).as("fixed_version"))
    val packageless = advisories
      .join(impacts.select("avid").distinct(), Seq("avid"), "left_anti")
      .select(col("avid"), lit(null).cast("string").as("ptype"),
        lit(null).cast("string").as("namespace"),
        lit(null).cast("string").as("name"),
        lit(null).cast("string").as("qualifiers"),
        array().cast("array<string>").as("affected_versions"),
        lit(null).cast("string").as("fixed_version"))
    exploded.unionByName(packageless)
      .withColumn("confidence", lit(MaxConfidence))
  }

  /** ValidVersionImprover.get_inferences + generate_inferences
    * (improvers/valid_versions.py:85-214, utils.resolve_version_range /
    * nearest_patched_package / get_affected_packages_by_patched_package):
    * expand each impact's range against the KNOWN versions of its
    * package, assign every affected version its nearest strictly-greater
    * unaffected version as the fix, and group affected versions per fix.
    *
    * Faithful branch structure:
    *  - a range-less impact with a fixed_version yields ([], fixed) —
    *    with qualifiers when the advisory's impacts merge to one purl
    *    (AffectedPackage.merge path keeps pkg_qualifiers), without when
    *    they don't (the unmergeable branch builds the purl from
    *    type/namespace/name only);
    *  - range expansion always drops qualifiers
    *    (expand_verion_range_to_purls);
    *  - a range that matches no known version yields NOTHING;
    *  - affected versions above every unaffected one group under a NULL
    *    fix.
    *
    * Version hygiene per resolve_version_range: strip spaces and a
    * leading v/V before matching.
    *
    * Scale shape: `validVersions` is the corpus-scale versions dimension;
    * impacts (advisory-sized) join it on the package natural key, range
    * containment runs as the codegen'd expression over the joined
    * stream, and the fix assignment is one window per (impact, package)
    * partition — no collect, no per-advisory remote fetch.
    *
    * @param impacts (avid, ptype, namespace, name, qualifiers,
    *                affecting_vers, fixed_version)
    * @param validVersions (ptype, namespace, name, version)
    */
  def validVersionInferences(impacts: DataFrame,
      validVersions: DataFrame): DataFrame = {
    // AffectedPackage.merge (importer.py): one distinct purl across the
    // advisory's impacts → merged branch; several → unmergeable branch.
    // (null-safe key: countDistinct drops tuples containing a null)
    val mergeable = impacts.groupBy("avid")
      .agg(countDistinct(concat_ws("\u0001",
        coalesce(col("ptype"), lit("")), coalesce(col("namespace"), lit("")),
        coalesce(col("name"), lit("")), coalesce(col("qualifiers"), lit(""))))
        .as("_npurl"),
        max(when(col("affecting_vers").isNotNull &&
          length(col("affecting_vers")) > 0, 1).otherwise(0))
          .as("_has_range"))
      .withColumn("_merged", col("_npurl") === 1).drop("_npurl")
    val marked = impacts.join(mergeable, Seq("avid"))
      .withColumn("_impact_id", monotonically_increasing_id())

    // Branch A: range-less fixed pins. Merged keeps qualifiers,
    // unmergeable drops them (valid_versions.py:108-120 vs :136-156).
    // In the MERGED branch pins only surface when the advisory has NO
    // range at all (valid_versions.py:148-156: `if not
    // affected_version_ranges` — otherwise only range inferences emit);
    // the unmergeable branch decides row by row.
    val rangeless = marked
      .filter((col("affecting_vers").isNull ||
        length(col("affecting_vers")) === 0) &&
        col("fixed_version").isNotNull && length(col("fixed_version")) > 0)
      .filter(!col("_merged") || col("_has_range") === 0)
      .select(col("avid"), col("ptype"), col("namespace"), col("name"),
        when(col("_merged"), col("qualifiers")).as("qualifiers"),
        array().cast("array<string>").as("affected_versions"),
        renderUdf(col("ptype"), col("fixed_version")).as("fixed_version"))

    // Branch B: range expansion against the known versions.
    val ranged = marked
      .filter(col("affecting_vers").isNotNull &&
        length(col("affecting_vers")) > 0)
      .select("_impact_id", "avid", "ptype", "namespace", "name",
        "affecting_vers")
    val cleaned = validVersions
      .withColumn("version", regexp_replace(col("version"), "\\s+", ""))
      .withColumn("version", regexp_replace(col("version"), "^[vV]+", ""))
      .select("ptype", "namespace", "name", "version").distinct()
    val joined = ranged
      .join(cleaned, Seq("ptype", "namespace", "name"))
      .withColumn("in_range", GraftFunctions.versionInRange(col("version"),
        col("affecting_vers")))
      .withColumn("_vkey", GraftFunctions.versionSortKey(
        regexp_extract(col("affecting_vers"), "^vers:([^/]+)/", 1),
        col("version")))
    // nearest strictly-greater unaffected version (bisect_right): walk
    // versions descending; the fix for an affected row is the LAST
    // unaffected version seen strictly before it.
    val w = Window.partitionBy("_impact_id")
      .orderBy(col("_vkey").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val assigned = joined
      .withColumn("fixed_version",
        last(when(!col("in_range"), col("version")), ignoreNulls = true)
          .over(w))
      .filter(col("in_range"))
    val expanded = assigned
      .groupBy("_impact_id", "avid", "ptype", "namespace", "name",
        "fixed_version")
      .agg(sort_array(collect_list(struct(col("_vkey"), col("version"))))
        .as("_av"))
      .withColumn("affected_versions",
        expr("transform(_av, x -> x.version)"))
      .select(col("avid"), col("ptype"), col("namespace"), col("name"),
        lit(null).cast("string").as("qualifiers"),
        col("affected_versions"), col("fixed_version"))

    rangeless.unionByName(expanded)
      .withColumn("confidence", lit(MaxConfidence))
  }
}
