package graft.derive

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions
import graft.operators.ConnectedComponents

/** Batch derivation jobs: advisories → derived/serving tables.
  *
  * Spark-first recompute model: instead of the reference's row-at-a-time
  * upserts (get_or_create / bulk_update inside transactions,
  * pipes/advisory.py:291-419), every derived table is deterministically
  * recomputed from the advisory log — idempotent, restartable, and
  * partition-parallel. At 100 TB each derivation is one or two shuffles
  * keyed as noted per job.
  */
object AdvisoryDerive {

  /** The canonical content-identity column (sha256 over normalized
    * content) -- ONE definition shared by the batch latest-flag window
    * and the streaming latest-pointer state, so the two paths can never
    * disagree on what "same content" means. */
  def contentIdColumn: org.apache.spark.sql.Column = {
    // every field coalesced to "": concat_ws SKIPS null arguments
    // entirely (the slot vanishes rather than staying empty), so
    // without the coalesce two rows whose nulls differ could shift
    // into the same canonical string and collide content ids -- the
    // canonical ingest path happens to pre-coalesce today, but this
    // column is the ONE shared definition and must not depend on that
    val canonical = concat_ws("\u0000",
      coalesce(lower(trim(col("summary"))), lit("")),
      coalesce(array_join(array_sort(col("aliases")), "|"), lit("")),
      coalesce(array_join(array_sort(
        expr("transform(references, r -> r.url)")), "|"), lit("")),
      coalesce(array_join(array_sort(expr(
        "transform(severities, s -> concat(s.scoring_system, ':', s.value))")),
        "|"), lit("")),
      coalesce(array_join(array_sort(expr(
        """transform(affected, a ->
          |  concat(a.purl, '#', a.affecting_vers, '#', a.fixed_vers))"""
          .stripMargin)), "|"), lit("")))
    sha2(canonical, 256)
  }

  /** Content identity + latest flag (SURVEY A11 + W2 + D1).
    * content id = sha256 over the canonical normalized content; is_latest
    * via row_number per avid ordered by date_collected desc. */
  def withContentIdAndLatest(advisories: DataFrame): DataFrame = {
    val withId = advisories
      .withColumn("avid", concat_ws("/", col("datasource_id"), col("advisory_id")))
      .withColumn("unique_content_id", contentIdColumn)
    val w = Window.partitionBy("avid")
      .orderBy(col("date_collected").desc, col("unique_content_id"))
    withId.withColumn("is_latest", row_number().over(w) === 1)
  }

  /** Drop exact-content duplicates, keeping the earliest (D1). */
  def dedupeByContent(advisories: DataFrame): DataFrame = {
    val w = Window.partitionBy("unique_content_id")
      .orderBy(col("date_collected"), col("avid"))
    advisories.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Normalized link tables from the nested arrays (the prefetch-join
    * inverse, J12): impacts, aliases, references, severities. */
  def impacts(advisories: DataFrame): DataFrame =
    advisories.filter(col("is_latest"))
      .select(col("avid"), explode(col("affected")).as("a"))
      .select(col("avid"), col("a.purl").as("base_purl"),
        col("a.affecting_vers"), col("a.fixed_vers"))

  def aliasLinks(advisories: DataFrame): DataFrame =
    advisories.filter(col("is_latest"))
      .select(col("avid"), explode(col("aliases")).as("alias"))
      .distinct()

  /** Unfurl (V2): impacts × known-versions dimension → concrete affected /
    * fixed package link rows. versionsDim: (base_purl, version).
    * Scale: equi-join on base_purl (the package group), membership filter
    * as residual predicate — shuffle is keyed by package, skew handled by
    * AQE (hot npm/debian groups). */
  def unfurl(impactsDf: DataFrame, versionsDim: DataFrame): DataFrame =
    impactsDf.join(versionsDim, Seq("base_purl"))
      .withColumn("is_affected",
        GraftFunctions.versionInRange(col("version"), col("affecting_vers")))
      .withColumn("is_fixed",
        GraftFunctions.versionInRange(col("version"), col("fixed_vers")))
      .filter(col("is_affected") || col("is_fixed"))
      .select(col("avid"), col("base_purl"), col("version"),
        col("is_affected"), col("is_fixed"))

  /** Concrete package table (PackageV2, models.py:3720-3896): purl
    * components + denormalized package_url / plain_package_url strings,
    * derived from the versions dimension through the purl codec. */
  def packages(versionsDim: DataFrame): DataFrame = {
    val withPurl = versionsDim.withColumn("package_url",
      GraftFunctions.purlNormalizeUdf(
        concat(col("base_purl"), lit("@"), col("version"))))
    withPurl
      .withColumn("plain_package_url", GraftFunctions.purlPlainUdf(col("package_url")))
      .withColumn("ptype",
        regexp_extract(col("base_purl"), "^pkg:([^/]+)/", 1))
      .withColumn("name",
        regexp_extract(col("base_purl"), "([^/]+)$", 1))
      .withColumn("namespace",
        regexp_extract(col("base_purl"), "^pkg:[^/]+/(?:(.*)/)?[^/]+$", 1))
      .select("package_url", "plain_package_url", "base_purl", "ptype",
        "namespace", "name", "version")
  }

  /** version_rank (W1): ecosystem-order rank per package group. */
  def versionRank(versionsDim: DataFrame): DataFrame = {
    val keyed = versionsDim.withColumn("sort_key",
      GraftFunctions.versionSortKey(
        GraftFunctions.purlVersionScheme(col("base_purl")), col("version")))
    val w = Window.partitionBy("base_purl").orderBy(col("sort_key"),
      col("version"))
    keyed.withColumn("version_rank", row_number().over(w)).drop("sort_key")
  }

  /** Nearest fixed version per affected package version (J7): the minimum
    * fixed rank strictly greater than the affected rank, within the same
    * (avid, package) impact. */
  def nearestFix(unfurled: DataFrame, ranked: DataFrame): DataFrame = {
    val r = ranked.select(col("base_purl"), col("version"),
      col("version_rank"))
    val u = unfurled.join(r, Seq("base_purl", "version"))
    val affected = u.filter(col("is_affected"))
      .select(col("avid"), col("base_purl"),
        col("version").as("affected_version"),
        col("version_rank").as("affected_rank"))
    val fixed = u.filter(col("is_fixed"))
      .select(col("avid").as("f_avid"), col("base_purl").as("f_purl"),
        col("version").as("fixed_version"),
        col("version_rank").as("fixed_rank"))
    affected.join(fixed,
      col("avid") === col("f_avid") && col("base_purl") === col("f_purl")
        && col("fixed_rank") > col("affected_rank"), "left")
      .groupBy("avid", "base_purl", "affected_version", "affected_rank")
      .agg(min_by(col("fixed_version"), col("fixed_rank"))
        .as("nearest_fixed_version"))
      .drop("affected_rank")
  }

  /** Risk trio with data-shaped inputs (the 100 TB form): the ~2,900-row
    * weight_config as a broadcast dimension (domain, weight) and the KEV/
    * ExploitDB catalog as an avid set driving the exploitability=2 tier
    * (risk.py:64-70 "any exploit known"). */
  def advisoryRiskFull(advisories: DataFrame, weightsDim: DataFrame,
      exploitAvids: DataFrame): DataFrame = {
    val base = advisoryRiskInternal(advisories, weightsDim)
    val withExploit = base
      .join(broadcast(exploitAvids.select(col("avid")).distinct()
        .withColumn("has_exploit", lit(true))), Seq("avid"), "left")
      .withColumn("exploitability",
        when(coalesce(col("has_exploit"), lit(false)), 2.0)
          .otherwise(col("exploitability")))
      .withColumn("risk_score", riskScoreCol)
    withExploit.select("avid", "weighted_severity", "exploitability",
      "risk_score")
  }

  /** Risk trio with external severity donors (A6 high_epss tier on real
    * feed data): donors — e.g. EpssIngest.donors rows — relate to
    * advisories by advisory_id OR alias (J11, relate_severities.py:61-119),
    * and any related epss donor above the threshold lifts exploitability
    * to 2.0 (risk.py:64-92). The donor→avid join shuffles on the match
    * key (both sides corpus-scale); only the resulting high-epss avid set
    * — bounded by the donors above threshold, a few percent of the EPSS
    * feed — is broadcast back onto the risk table.
    */
  def advisoryRiskWithDonors(advisories: DataFrame, donorSevs: DataFrame,
      weightsDim: DataFrame): DataFrame = {
    val base = advisoryRiskInternal(advisories, weightsDim)
    val highEpssDonors = donorSevs
      .filter(col("scoring_system") === "epss" &&
        col("score") > graft.ingest.EpssIngest.HighEpssThreshold)
      .select("donor_id", "match_key")
    val donated = relateSeverities(advisories, highEpssDonors)
      .select("avid").distinct()
      .withColumn("donated_high_epss", lit(true))
    base.join(broadcast(donated), Seq("avid"), "left")
      .withColumn("exploitability",
        when(coalesce(col("donated_high_epss"), lit(false)), 2.0)
          .otherwise(col("exploitability")))
      .withColumn("risk_score", riskScoreCol)
      .select("avid", "weighted_severity", "exploitability", "risk_score")
  }

  /** Risk trio per advisory (A5–A7): weighted severity (severity value ×
    * source-domain weight), exploitability cascade, capped risk. Weights
    * default to the bundled ~2,900-domain weight_config table
    * ([[graft.functions.SeverityWeights]]) as the reference does
    * (risk.py:16,46); pass an explicit map to override. */
  def advisoryRisk(advisories: DataFrame,
      weights: Map[String, Int] = graft.functions.SeverityWeights.map)
      : DataFrame = {
    val spark = advisories.sparkSession
    import spark.implicits._
    advisoryRiskInternal(advisories,
      weights.toSeq.toDF("domain", "weight"))
  }

  /** risk = min(ws × e, 10) HALF_UP 1dp, unset unless BOTH factors are
    * truthy (pipes/risk_score.py:114-116) — shared by every risk variant
    * so the null gate can't drift. */
  private def riskScoreCol: Column =
    when(col("weighted_severity") > 0 && col("exploitability") > 0,
      round(least(col("weighted_severity") * col("exploitability"),
        lit(10.0)), 1))

  private def advisoryRiskInternal(advisories: DataFrame,
      weightsDim: DataFrame): DataFrame = {
    val sev = advisories.filter(col("is_latest"))
      .select(col("avid"), col("references"),
        explode_outer(col("severities")).as("s"))
      // float(value) first (risk.py:52), else score the CVSS vector
      // itself (OSV severities carry the vector, not a number), else the
      // textual map with unknown-textual→0 (risk.py:56)
      .withColumn("score",
        coalesce(GraftFunctions.numericScoreUdf(col("s.value")),
          GraftFunctions.cvssBaseScoreUdf(col("s.scoring_elements")),
          GraftFunctions.severityScoreUdf(col("s.value"))))
      .withColumn("domain", GraftFunctions.urlDomainUdf(col("s.url")))
    // weight_config as a broadcast dimension join (weight_config.py has
    // ~2,900 domains — a dimension table, not a literal)
    val weighted = sev
      .join(broadcast(weightsDim.select(col("domain"),
        col("weight").cast("int").as("_w"))), Seq("domain"), "left")
      .withColumn("w",
        coalesce(col("_w"), lit(graft.functions.Risk.DefaultWeight)))
      // a severity with no URL is skipped by the weighted max entirely
      // (risk.py:42-43) but still feeds the EPSS exploitability rung,
      // which iterates severities without the URL guard (risk.py:79-83)
      .withColumn("ws",
        when(length(col("s.url")) > 0, col("score") * col("w") / 10.0))
      .groupBy("avid")
      // 0.0 when nothing contributes — the reference's empty max is 0,
      // not absent (risk.py:60), and quantize keeps it a stored value
      .agg(coalesce(round(max("ws"), 1), lit(0.0))
          .as("weighted_severity"),
        max(when(col("s.scoring_system") === "epss" &&
          col("score") > graft.ingest.EpssIngest.HighEpssThreshold,
          true).otherwise(false)).as("high_epss"))
    val exploitRef = advisories.filter(col("is_latest"))
      .select(col("avid"),
        exists(col("references"), r =>
          r.getField("reference_type") === "exploit").as("has_exploit_ref"))
    weighted.join(exploitRef, Seq("avid"), "left")
      .withColumn("exploitability",
        when(col("high_epss"), 2.0)
          .when(col("has_exploit_ref"), 1.0)
          .otherwise(0.5))
      .withColumn("risk_score", riskScoreCol)
      .select("avid", "weighted_severity", "exploitability", "risk_score")
  }

  /** Package risk = max risk over affecting advisories (A8). */
  def packageRisk(unfurled: DataFrame, advisoryRiskDf: DataFrame): DataFrame =
    unfurled.filter(col("is_affected"))
      .join(advisoryRiskDf, Seq("avid"))
      .groupBy("base_purl", "version")
      .agg(round(max("risk_score"), 1).as("risk_score"))

  /** Advisory grouping (D2–D4, D12): advisories sharing an alias or
    * advisory_id form identity groups; primary = highest precedence then
    * lowest avid. Implemented as connected components over the
    * advisory–alias bipartite graph (hub-shaped → few label-prop rounds).
    */
  /** Advisory-count bound for the driver fast path: below it the whole
    * set materialization (ids, key edges, union-find, primary pick)
    * runs on one bounded collect instead of ~10 tiny-data Spark jobs —
    * the ConnectedComponents local-finish pattern one level up. Rows
    * are (avid, hash, aliases, precedence): well under 16 MB at the
    * bound. The 100 TB path never takes this branch. */
  private val SetsLocalThreshold = 100000

  def advisorySets(spark: SparkSession, advisories: DataFrame): DataFrame =
    advisorySetsKeyed(spark, advisories)
      .select("group_id", "avid", "primary_avid")

  /** [[advisorySets]] plus the per-group canonical `min_alias` (the
    * V1 vuln_key seed), computed inside the same pass so membership
    * (VulnerabilityV1.membership) does not re-explode the alias table.
    */
  def advisorySetsKeyed(spark: SparkSession,
      advisories: DataFrame): DataFrame =
    advisorySetsKeyed(spark, advisories, SetsLocalThreshold)

  /** `localThreshold` is exposed for the path-equivalence spec (0
    * forces the distributed branch on tiny inputs); production callers
    * use the default. */
  private[derive] def advisorySetsKeyed(spark: SparkSession,
      advisories: DataFrame, localThreshold: Int): DataFrame = {
    val latest = advisories.filter(col("is_latest"))
    // Bounded-input fast path: ONE limit-guarded collect decides and,
    // when the input is small, also supplies the data. Node ids come
    // from the same xxhash64 Spark expression as the distributed path
    // (never re-implemented driver-side), so outputs are identical.
    val probe = latest
      .select(col("avid"), xxhash64(col("avid")).as("node_id"),
        coalesce(col("aliases"), array()).as("aliases"),
        col("advisory_id"),
        col("precedence").cast("long").as("precedence"))
      .limit(localThreshold + 1).collect()
    if (probe.length <= localThreshold) {
      // precedence reads as Option: Row.getLong NPEs on null, and the
      // distributed Window's `desc` orders nulls LAST — mirror that
      val rows = probe.map(r => (r.getString(0), r.getLong(1),
        r.getSeq[String](2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
      require(rows.map(_._1).distinct.size ==
        rows.map(_._2).distinct.size,
        "xxhash64 node-id collision in advisory set ids")
      // union-find over shared keys (star to min node per key)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x
        else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // null KEYS never join in the distributed path (SQL equi-join
      // semantics), so a null alias element or null advisory_id must
      // not union here either — without the filter two advisories
      // sharing only a null alias would merge locally but not
      // distributed
      val byKey = scala.collection.mutable.Map[String, Long]()
      rows.foreach { case (_, node, aliases, advisoryId, _) =>
        (aliases :+ advisoryId).filter(_ != null).foreach { k =>
          byKey.get(k) match {
            case Some(root) => union(node, root)
            case None       => byKey(k) = node
          }
        }
      }
      // group id = min node id per component (the distributed contract)
      val groupOf = scala.collection.mutable.Map[Long, Long]()
      rows.foreach { case (_, node, _, _, _) =>
        val r = find(node)
        groupOf(r) = math.min(groupOf.getOrElse(r, node), node)
      }
      val grouped = rows.groupBy(r => groupOf(find(r._2)))
      // string ties break in UTF-8 byte order (== code point order) to
      // match Spark's binary comparisons: Java String.compareTo is
      // UTF-16 code-unit order, which disagrees for supplementary
      // characters
      val utf8Ord: Ordering[String] = (a: String, b: String) => {
        val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        java.util.Arrays.compareUnsigned(x, y)
      }
      // primary pick mirrors the distributed Window.orderBy(
      // precedence.desc, avid): precedence descending with nulls LAST
      // (Spark's desc default; no negation — Long.MinValue-safe), avid
      // in binary order
      val precDescNullsLast: Ordering[Option[Long]] =
        (a: Option[Long], b: Option[Long]) => (a, b) match {
          case (Some(x), Some(y)) => java.lang.Long.compare(y, x)
          case (Some(_), None)    => -1
          case (None, Some(_))    => 1
          case (None, None)       => 0
        }
      val primaryOrd: Ordering[(Option[Long], String)] =
        Ordering.Tuple2(precDescNullsLast, utf8Ord)
      val primary = grouped.map { case (gid, members) =>
        gid -> members.map(m => (m._5, m._1)).min(primaryOrd)._2
      }
      // SQL min() skips null alias elements; mirror it (a null here
      // would NPE utf8Ord's getBytes besides ranking differently)
      val minAlias = grouped.map { case (gid, members) =>
        gid -> members.flatMap(_._3).filter(_ != null)
          .sorted(utf8Ord).headOption.orNull
      }
      import spark.implicits._
      return rows.map { case (avid, node, _, _, _) =>
        val gid = groupOf(find(node))
        (gid, avid, primary(gid), minAlias(gid))
      }.toDF("group_id", "avid", "primary_avid", "min_alias")
    }
    // Node ids need uniqueness, not density or order: xxhash64(avid) is
    // embarrassingly parallel, where a row_number over a global Window
    // would funnel every advisory through one partition — the single
    // worst scale hazard in this pipeline. Component/group ids are then
    // the min hash in the component (deterministic for a given avid set).
    val ids = latest.select(col("avid")).distinct()
      .withColumn("node_id", xxhash64(col("avid")))
    // Collision guard: a 64-bit hash collision (birthday-bound real at
    // billions of advisories) would silently merge two unrelated
    // advisories into one set — fail loudly instead. One cheap aggregate
    // over the id table; swap in a wider hash if this ever fires.
    val Array(nAvid, nNode) = ids
      .agg(countDistinct("avid"), countDistinct("node_id"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    require(nAvid == nNode,
      s"xxhash64 node-id collision: $nAvid distinct avids -> $nNode node ids")
    // coalesce BEFORE concat: concat(NULL, [id]) is NULL and explode
    // would drop the advisory's keys entirely, grouping a null-alias
    // advisory differently above vs below the local threshold
    val keys = latest
      .select(col("avid"), explode(concat(
        coalesce(col("aliases"), array().cast("array<string>")),
        array(col("advisory_id")))).as("key"))
      .join(ids, Seq("avid"))
    // edges: advisories sharing a key → star to the min node per key
    val keyMin = keys.groupBy("key").agg(min("node_id").as("root"))
    val edges = keys.join(keyMin, Seq("key"))
      .filter(col("node_id") =!= col("root"))
      .select(col("node_id").as("src"), col("root").as("dst"))
      .distinct()
    val cc = ConnectedComponents.labelPropagation(spark, edges)
    val membership = ids.join(cc, ids("node_id") === cc("node"), "left")
      .select(col("avid"),
        coalesce(col("component"), col("node_id")).as("group_id"))
    val withPrec = membership.join(
      latest.select(col("avid"), col("precedence")), Seq("avid"))
    val w = Window.partitionBy("group_id")
      .orderBy(col("precedence").desc, col("avid"))
    val sets = withPrec
      .withColumn("primary_avid", first("avid").over(w))
      .select("group_id", "avid", "primary_avid")
    val minAlias = latest
      .select(col("avid"), explode_outer(col("aliases")).as("alias"))
      .join(sets.select("avid", "group_id"), Seq("avid"))
      .groupBy("group_id").agg(min("alias").as("min_alias"))
    sets.join(minAlias, Seq("group_id"), "left")
  }

  /** Per-advisory ToDo detection
    * (compute_advisory_todo.py:36-58,140-197): MISSING_SUMMARY is an
    * INDEPENDENT check (an advisory can carry it alongside a package
    * issue), and the package check is the reference's trichotomy over
    * two existence flags — any affected entry with a version range, any
    * entry with a fixed version (a bare `vers:<scheme>/` counts as
    * absent). Map-only: two flag expressions and a union, no shuffle. */
  def todos(advisories: DataFrame): DataFrame = {
    val latest = advisories.filter(col("is_latest"))
    val summaryIssues = latest
      .filter(col("summary").isNull || length(trim(col("summary"))) === 0)
      .select(col("avid"), lit("MISSING_SUMMARY").as("issue"))
    val pkgIssues = latest.select(col("avid"),
      expr("exists(affected, a -> a.affecting_vers != '' AND " +
        "a.affecting_vers NOT LIKE '%/')").as("_has_aff"),
      expr("exists(affected, a -> a.fixed_vers != '' AND " +
        "a.fixed_vers NOT LIKE '%/')").as("_has_fix"))
      .select(col("avid"),
        when(!col("_has_aff") && !col("_has_fix"),
          "MISSING_AFFECTED_AND_FIXED_BY_PACKAGES")
          .when(!col("_has_aff"), "MISSING_AFFECTED_PACKAGE")
          .when(!col("_has_fix"), "MISSING_FIXED_BY_PACKAGE")
          .otherwise(null).as("issue"))
      .filter(col("issue").isNotNull)
    summaryIssues.unionByName(pkgIssues)
  }

  /** J11 — severity-relation join (relate_severities.py:61-119): donor
    * advisories (EPSS/SUSE severity carriers) matched to real advisories
    * by advisory_id OR shared alias; union of the two equi-joins,
    * distinct pairs. donors: (donor_id, match_key). */
  def relateSeverities(advisories: DataFrame, donors: DataFrame): DataFrame = {
    val latest = advisories.filter(col("is_latest"))
    val byId = latest.select(col("avid"), col("advisory_id").as("k"))
    val byAlias = latest.select(col("avid"), explode(col("aliases")).as("k"))
    byId.unionByName(byAlias)
      .join(donors, col("k") === col("match_key"))
      .select(col("avid"), col("donor_id"))
      .distinct()
  }

  /** CVE→advisory CVSS3.1 mapping (pipelines/add_cvss31_to_CVEs.py:25-102,
    * pipeline_id "add_cvssv3.1_to_CVEs"): advisories carrying an NVD
    * cvssv3 severity URL get the cvssv3.1 score of the NVD advisory
    * aliased to that CVE. Steps, Spark-first:
    *  1. carriers — explode severities, keep scoring_system 'cvssv3'
    *     with url starting https://nvd.nist.gov/vuln/detail/CVE-, and
    *     regex the CVE id out of the URL (same CVE-\d{4}-\d{4,7}
    *     pattern);
    *  2. donors — the NVD datasource's advisories keyed by alias, with
    *     their cvssv3.1 severities (created_by='nvd_importer' filter);
    *  3. equi-join carrier cve_id = donor alias; emit one cvssv3.1
    *     severity row per carrier advisory, with the update_or_create
    *     uniqueness key (system, url, value, scoring_elements) as a
    *     distinct.
    * Scale: both sides shuffle on the CVE key; the severity explosion is
    * map-side; no driver loops (the reference pages through Python
    * batches of 1000).
    */
  def cveCvss31Severities(advisories: DataFrame,
      nvdDatasource: String = "nvd"): DataFrame = {
    val latest = advisories.filter(col("is_latest"))
    val carriers = latest
      .select(col("avid"), explode(col("severities")).as("s"))
      .filter(col("s.scoring_system") === "cvssv3" &&
        col("s.url").startsWith("https://nvd.nist.gov/vuln/detail/CVE-"))
      .select(col("avid"),
        regexp_extract(col("s.url"), "(CVE-\\d{4}-\\d{4,7})", 1).as("cve_id"))
      .filter(col("cve_id") =!= "")
      .distinct()
    val donors = latest
      .filter(col("datasource_id") === nvdDatasource)
      .select(col("aliases"), explode(col("severities")).as("s"))
      .filter(col("s.scoring_system") === "cvssv3.1")
      .select(explode(col("aliases")).as("alias"),
        col("s.value").as("value"),
        col("s.scoring_elements").as("scoring_elements"))
    carriers.join(donors, carriers("cve_id") === donors("alias"))
      .select(col("avid"), col("cve_id"),
        lit("cvssv3.1").as("scoring_system"),
        concat(lit("https://nvd.nist.gov/vuln/detail/"), col("cve_id"))
          .as("url"),
        col("value"), col("scoring_elements"))
      .distinct()
  }

  /** AdvisoryExploit mart (enhance_with_exploitdb.py:72-130,
    * enhance_with_metasploit.py:59-130, Exploit model models.py:1720-1808):
    * catalog records — KEV, Exploit-DB, Metasploit, all shaped as
    * (alias, record_id, data_source, dates, description, flags) — match
    * advisories by alias and dedupe per the improvers' seen-key
    * (advisory, data_source, record_id). The catalog side is bounded
    * (tens of thousands of rows) and broadcasts. */
  def advisoryExploits(advisories: DataFrame, records: DataFrame): DataFrame = {
    val links = aliasLinks(advisories)
    links.join(broadcast(records), Seq("alias"))
      .dropDuplicates("avid", "data_source", "record_id")
      .drop("alias")
  }

  /** AdvisoryPOC mart (enhance_with_github_poc.py:42-80): PoC repo links
    * matched to advisories by alias, unique per (advisory, url) like the
    * improver's update_or_create key. */
  def advisoryPocs(advisories: DataFrame, pocs: DataFrame): DataFrame =
    aliasLinks(advisories).join(broadcast(pocs), Seq("alias"))
      .dropDuplicates("avid", "url")
      .drop("alias")

  /** SSVC decision mart (collect_ssvc_trees.py:43-189 + models.py:4051-4071):
    * one row per (source avid, vector) from ssvc-system severities, with
    * the vector expanded to its option list and decision. Distributed
    * shape: explode severities → per-row vector parse (UDF — the decode
    * is a tiny dictionary walk), distinct on the model's
    * (vector, source_advisory) uniqueness key.
    */
  def ssvcDecisions(advisories: DataFrame): DataFrame = {
    val parse = GraftFunctions.ssvcParseUdf
    advisories.filter(col("is_latest"))
      .select(col("avid").as("source_avid"),
        col("advisory_id").as("source_advisory_id"),
        col("url").as("source_url"),
        explode(col("severities")).as("s"))
      .filter(col("s.scoring_system") === "ssvc")
      .select(col("source_avid"), col("source_advisory_id"),
        col("source_url"),
        col("s.scoring_elements").as("vector"),
        parse(col("s.scoring_elements")).as("parsed"))
      .filter(col("parsed").isNotNull)
      .select(col("source_avid"), col("source_advisory_id"),
        col("source_url"), col("vector"),
        col("parsed.options").as("options"),
        col("parsed.decision").as("decision"))
      .dropDuplicates("vector", "source_avid")
  }

  /** SSVC → advisory relations (collect_ssvc_trees.py:65-82): every
    * advisory whose advisory_id or alias equals the SSVC source's
    * advisory_id relates to that decision, minus the source itself.
    * Reuses the J11 match-key join (shuffles on the key; the ssvc table
    * is severity-bounded). */
  def ssvcRelations(advisories: DataFrame, ssvc: DataFrame): DataFrame =
    relateSeverities(advisories,
      ssvc.select(col("source_avid").as("donor_id"),
        col("source_advisory_id").as("match_key")).distinct())
      .filter(col("avid") =!= col("donor_id"))
      .select(col("avid"), col("donor_id").as("source_avid"))

  /** PackageCommitPatch mart (models.py:2892-2924): commit references
    * harvested from advisories (D10 semantics — VCS-normalized commit
    * URLs) joined with patch-text donors, checksummed with sha512 exactly
    * like compute_patch_checksum (utils.py:866-870), unique per
    * (commit_hash, vcs_url). `patches` rows: (vcs_url, commit_hash,
    * patch_text). */
  /** CodeFixV2 mart (v2_improvers/collect_commits.py:35-77 +
    * models.py:1943-1969): advisory references whose URL is a VCS URL
    * containing `/commit/` become one CodeFix row per affecting
    * concrete package of that advisory. normalize_vcs_url
    * (collect_commits.py:130-175) returns any URL that already carries
    * a VCS or plain scheme VERBATIM — and the `/commit/` + scheme
    * filter admits only those — so the stored commit URL is the
    * trimmed reference URL, exactly like the reference (no scheme
    * rewriting; its git@/shortcut branches cannot contain `/commit/`).
    * A commit already claimed by another advisory is skipped — the
    * reference's is-already-processed check walks advisories in
    * queryset order, re-expressed deterministically as min(avid) per
    * commit URL.
    *
    * Shape: explode references (narrow), one groupBy on the commit URL
    * for the first-wins dedup, one equi-join to the affecting edge. */
  def codeFixes(advisories: DataFrame, unfurled: DataFrame): DataFrame =
    codeFixesFromLinks(
      advisories.filter(col("is_latest"))
        .select(col("avid"), explode(col("references")).as("r"))
        .select(col("avid"), col("r.url").as("url")),
      unfurled)

  /** [[codeFixes]] over FLAT (avid, url) reference-link rows — the shape
    * the reference pipeline actually iterates (v2_improvers/
    * collect_commits.py:51 walks the AdvisoryReference link table, not
    * nested arrays). Prefer this entry point when links are already
    * flat: nesting rows into per-advisory arrays only to explode them
    * back moves the whole reference corpus through a collect_list
    * shuffle for nothing (FanoutStageProbe measured that round-trip as
    * 94% of d20's 100× cost: nested 89.9 s vs link-fed 5.4 s for
    * identical output — the avid-domain modulo made each synthetic
    * advisory carry ~3M references). The filter + first-claim
    * min here combine map-side, so this path's only wide shuffle
    * carries the ~|distinct vcs_url| claim table. */
  def codeFixesFromLinks(links: DataFrame, unfurled: DataFrame): DataFrame = {
    val commitRefs = links
      .filter(col("url").contains("/commit/") &&
        col("url").rlike(
          "^(git\\+)?(https?|git|hg|svn)(\\+https?|\\+git)?://"))
      .select(col("avid"), trim(col("url")).as("vcs_url"))
    val firstClaim = commitRefs.groupBy("vcs_url")
      .agg(min(col("avid")).as("avid"))
    val affecting = unfurled.filter(col("is_affected"))
      .select(col("avid"), col("base_purl"), col("version")).distinct()
    firstClaim.join(affecting, Seq("avid"))
      .select(col("vcs_url"), col("avid"),
        concat(col("base_purl"), lit("@"), col("version"))
          .as("affected_package"))
  }

  def commitPatches(advisories: DataFrame, patches: DataFrame): DataFrame = {
    val commitRefs = advisories.filter(col("is_latest"))
      .select(col("avid"), explode(col("references")).as("r"))
      .select(col("avid"), col("r.url").as("url"))
      .filter(col("url").rlike("/(commit|commits)/[0-9a-f]{7,40}"))
      .select(col("avid"),
        regexp_extract(col("url"), "(.*?)/(?:commit|commits)/[0-9a-f]+", 1)
          .as("vcs_url"),
        regexp_extract(col("url"), "/(?:commit|commits)/([0-9a-f]+)", 1)
          .as("commit_hash"))
    commitPatchesFromLinks(commitRefs, patches)
  }

  /** commitPatches over pre-extracted structured links — the importer-fed
    * path (AdvisoryJsonIngest.commitLinks yields the
    * fixed_by_commit_patches rows importers carry,
    * importer.py:207-301). */
  def commitPatchesFromLinks(links: DataFrame, patches: DataFrame): DataFrame =
    links.select("avid", "vcs_url", "commit_hash")
      .join(patches, Seq("vcs_url", "commit_hash"), "left")
      .groupBy("vcs_url", "commit_hash")
      .agg(array_sort(collect_set(col("avid"))).as("avids"),
        first(col("patch_text"), ignoreNulls = true).as("patch_text"))
      .withColumn("patch_checksum",
        when(col("patch_text").isNotNull, sha2(col("patch_text"), 512)))

  /** AdvisoryMitigations mart (models.py:3473-3531): one row per
    * (advisory, version-less base purl) with the remediation sets the v3
    * detail serves. The reference fills this table by human curation
    * (views.py mitigation_curation); the derivable parts are recomputed
    * here from the advisory content itself:
    *  - upgrade_to_versions — the advisory's fixed package versions for
    *    that purl (the unfurl is_fixed edge set)
    *  - patches — the advisory's PackageCommitPatch links
    *    (commitPatches rows), rendered as vcs_url@commit_hash ids
    * The curated-text fields (downgrade/replace sets, config_change,
    * filter_ports_ips and the *_note columns) have no automated source —
    * they carry the model's blank default and are populated by the
    * curation workflow (upsert = recompute + coalesce over a curated
    * overlay table, like every mart here).
    *
    * Scale: one groupBy per input keyed on (avid, base_purl) / avid; the
    * patch side is advisory-bounded and joins broadcast.
    */
  def mitigations(unfurled: DataFrame, patches: DataFrame): DataFrame = {
    val perPurl = unfurled.groupBy("avid", "base_purl")
      .agg(
        array_sort(collect_set(when(col("is_fixed"), col("version"))))
          .as("upgrade_to_versions"),
        max(col("is_affected")).as("_impacted"))
      .filter(col("_impacted"))
      .drop("_impacted")
    val patchesByAvid = patches
      .select(explode(col("avids")).as("avid"),
        concat(col("vcs_url"), lit("@"), col("commit_hash")).as("patch_id"))
      .groupBy("avid")
      .agg(array_sort(collect_set("patch_id")).as("patches"))
    perPurl.join(patchesByAvid, Seq("avid"), "left")
      .select(col("avid"), col("base_purl"),
        col("upgrade_to_versions"),
        lit("").as("upgrade_to_versions_note"),
        array().cast("array<string>").as("downgrade_to_versions"),
        lit("").as("downgrade_to_versions_note"),
        coalesce(col("patches"), array()).as("patches"),
        lit("").as("patches_note"),
        lit("").as("config_change"),
        lit("").as("config_change_note"),
        lit("").as("filter_ports_ips"),
        lit("").as("filter_ports_ips_note"),
        array().cast("array<string>").as("replace_with_packages"),
        lit("").as("replace_package_note"))
  }

  /** Mitigation curation queue (views.py MitigationCuration view, the
    * MISSING_FIXED_BY_PACKAGE todo): per advisory, the impacted base
    * purls with NO fixed-by package — the `curation_items` the template
    * renders. */
  def mitigationCurationItems(unfurled: DataFrame): DataFrame =
    unfurled.groupBy("avid", "base_purl")
      .agg(max(col("is_affected")).as("_aff"), max(col("is_fixed")).as("_fix"))
      .filter(col("_aff") && !col("_fix"))
      .select("avid", "base_purl")

  /** D9 — summary back-fill (populate_vulnerability_summary_pipeline.py:
    * 21-71, pipeline_id "populate_vulnerability_summaries"): blank-summary
    * advisories receive the summary of the best (latest-collected,
    * non-empty) NVD advisory sharing a CVE alias. One row per back-filled
    * advisory: (avid, summary). Shuffles on the CVE key; best-donor pick
    * is a window over the (bounded) per-alias donor group. */
  def backfillSummaries(advisories: DataFrame,
      nvdDatasource: String = "nvd"): DataFrame = {
    val latest = advisories.filter(col("is_latest"))
    val donors = latest
      .filter(col("datasource_id") === nvdDatasource &&
        length(col("summary")) > 0)
      .select(explode(col("aliases")).as("alias"),
        col("summary").as("donor_summary"), col("date_collected"))
      .filter(col("alias").startsWith("CVE-"))
    val w = Window.partitionBy("alias")
      .orderBy(col("date_collected").desc, col("donor_summary"))
    val best = donors.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select("alias", "donor_summary", "date_collected")
    val blank = latest.filter(length(col("summary")) === 0)
      .select(col("avid"), explode(col("aliases")).as("alias"))
      .filter(col("alias").startsWith("CVE-"))
    // multi-alias advisories: the LATEST-collected donor wins across
    // aliases too (a bare min(summary) picked the alphabetically-first
    // text, which could be the stalest donor), ties to the smaller text
    val wAvid = Window.partitionBy("avid")
      .orderBy(col("date_collected").desc, col("donor_summary"))
    blank.join(best, Seq("alias"))
      .withColumn("_rn", row_number().over(wAvid))
      .filter(col("_rn") === 1)
      .select(col("avid"), col("donor_summary").as("summary"))
  }

  /** D8 — ghost-package flagging (flag_ghost_packages.py:35-90): exact
    * version pins claimed by impacts that do not exist in the upstream
    * known-versions dimension. Left-anti join keyed on the package
    * group. */
  def ghostPackages(impactsDf: DataFrame, versionsDim: DataFrame): DataFrame =
    impactsDf.select(col("base_purl"),
        explode(GraftFunctions.versExactPinsUdf(col("affecting_vers")))
          .as("version"))
      .distinct()
      .join(versionsDim.select("base_purl", "version"),
        Seq("base_purl", "version"), "left_anti")

  /** mark_unfurl_version_range_v2 (mark_unfurl_version_range.py:79-124):
    * per advisory, whether ALL its impacts have been unfurl-attempted
    * (last_range_unfurl_at set) and whether all attempts also succeeded
    * (last_successful_range_unfurl_at set) — the two flags that gate
    * `_all_impacts_unfurled_at` / complete_advisories_import. min() over
    * booleans = the reference's NOT EXISTS(unattempted) subquery, as one
    * partial-aggregatable groupBy. */
  def allImpactsUnfurled(impactsWithWatermark: DataFrame): DataFrame =
    impactsWithWatermark.groupBy("avid")
      .agg(
        min(col("last_range_unfurl_at").isNotNull).as("all_attempted"),
        min(col("last_range_unfurl_at").isNotNull &&
          col("last_successful_range_unfurl_at").isNotNull)
          .as("all_successful"))

  /** T3 — re-unfurl staleness selection (unfurl_version_range.py:201-212):
    * impacts never unfurled (null watermark) first, then those older than
    * the cutoff — nulls-first ordering per the reference. */
  def staleImpacts(impactsWithWatermark: DataFrame,
      cutoff: java.sql.Timestamp): DataFrame =
    impactsWithWatermark
      .filter(col("last_range_unfurl_at").isNull ||
        col("last_range_unfurl_at") <= lit(cutoff))
      .orderBy(asc_nulls_first("last_range_unfurl_at"))

  /** Append-only change log (T5, ChangeLog models.py:1530-1717): one event
    * per collected advisory version — 'import' for the first version of an
    * avid, 'update' after. Written append-mode; the table is the audit
    * history the reference keeps in ChangeLog subclasses. */
  def changeLog(advisories: DataFrame, actor: String = "graft"): DataFrame = {
    val w = Window.partitionBy("avid").orderBy(col("date_collected"),
      col("unique_content_id"))
    advisories
      .withColumn("seq", row_number().over(w))
      .select(
        col("avid"),
        col("date_collected").as("action_time"),
        when(col("seq") === 1, "import").otherwise("update").as("action_type"),
        col("url").as("source_url"),
        lit(actor).as("actor"))
  }

  /** PackageChangeLog mart (models.py:1648-1717 + test_changelog.py):
    * one AFFECTED_BY entry per (package version, advisory) affecting it
    * and one FIXING entry per fixing relation — idempotent like the
    * reference's log_action get_or_create (re-running the import never
    * duplicates an entry), with the advisory's datasource as the actor
    * and its URL as the source. Distinct over the action key; the
    * advisory dimension joins broadcast-size columns only. */
  def packageChangeLog(unfurled: DataFrame,
      advisories: DataFrame): DataFrame = {
    val dim = advisories.filter(col("is_latest"))
      .select(col("avid"), col("datasource_id").as("actor"),
        col("url").as("source_url"))
    val affected = unfurled.filter(col("is_affected"))
      .select(col("avid"), col("base_purl"), col("version"),
        lit("AFFECTED_BY").as("action_type"))
    val fixing = unfurled.filter(col("is_fixed"))
      .select(col("avid"), col("base_purl"), col("version"),
        lit("FIXING").as("action_type"))
    affected.unionByName(fixing)
      .distinct()
      .join(dim, Seq("avid"))
      .select(
        concat(col("base_purl"), lit("@"), col("version")).as("purl"),
        col("action_type"), col("avid"), col("actor"), col("source_url"))
  }

  /** Cross-advisory conflict ToDos
    * (compute_advisory_todo.py:89-135,200-307): for EVERY alias — the
    * reference chains cve_aliases and non_cve_aliases querysets
    * (:147-164), the `istartswith="cve"` split is processing order, not
    * a filter — compare PER-ADVISORY sets: each advisory's frozenset of
    * affected ranges and of fixed versions per purl; more than one
    * distinct set across advisories ⇒ conflict. Advisories flagged
    * MISSING_AFFECTED_AND_FIXED_BY_PACKAGES are excluded from every
    * alias's matrix (the reference's queryset `.exclude`), the
    * per-alias issue is the trichotomy
    * CONFLICTING_{AFFECTED_AND_FIXED_BY,AFFECTED,FIXED_BY}_PACKAGES,
    * and the related advisories are ONLY those attached to a purl with
    * an actual disagreement (`conflicting_advisories.update` runs after
    * the no-disagreement `continue`, :985-1001).
    *
    * Spark-first shape: two groupBys on narrowing keys
    * ((alias, purl, avid) → (alias, purl) → alias); set identity
    * compares as a sorted ``-joined string, never a driver-side
    * matrix. Scale: cardinality is bounded by impact rows; every
    * aggregation is partial-merge friendly. */
  def conflicts(advisories: DataFrame): DataFrame = {
    val excluded = todos(advisories)
      .filter(col("issue") === "MISSING_AFFECTED_AND_FIXED_BY_PACKAGES")
      .select("avid")
    val impacts = advisories.filter(col("is_latest"))
      .select(col("avid"), explode(col("aliases")).as("alias"),
        col("affected"))
      .join(excluded, Seq("avid"), "left_anti")
      .select(col("avid"), col("alias"), explode(col("affected")).as("a"))
    // one row per (alias, purl, advisory): that advisory's SET of
    // ranges/fixes for the purl (empty entries drop out of the set the
    // way the reference's truthiness guards drop them)
    val perAdvisory = impacts
      .groupBy(col("alias"), col("a.purl").as("purl"), col("avid"))
      .agg(
        array_join(array_sort(collect_set(when(
          col("a.affecting_vers") =!= "", col("a.affecting_vers")))),
          "\u0001").as("aff_set"),
        array_join(array_sort(collect_set(when(
          col("a.fixed_vers") =!= "", col("a.fixed_vers")))), "\u0001")
          .as("fix_set"))
    val perPurl = perAdvisory
      .groupBy("alias", "purl")
      .agg(
        (countDistinct(col("aff_set")) > 1).as("purl_aff_conflict"),
        (countDistinct(col("fix_set")) > 1).as("purl_fix_conflict"),
        collect_set(col("avid")).as("advisories"))
    perPurl
      .groupBy("alias")
      .agg(
        max(col("purl_aff_conflict")).as("_aff"),
        max(col("purl_fix_conflict")).as("_fix"),
        // only advisories attached to a DISAGREEING purl relate to the
        // ToDo (collect_list drops the nulls of agreeing purls)
        array_sort(array_distinct(flatten(collect_list(
          when(col("purl_aff_conflict") || col("purl_fix_conflict"),
            col("advisories")))))).as("related"))
      .filter(col("_aff") || col("_fix"))
      .select(col("alias"),
        when(col("_aff") && col("_fix"),
          "CONFLICTING_AFFECTED_AND_FIXED_BY_PACKAGES")
          .when(col("_aff"), "CONFLICTING_AFFECTED_PACKAGES")
          .otherwise("CONFLICTING_FIXED_BY_PACKAGES").as("issue"),
        array_join(col("related"), ",").as("advisory_list"))
  }
}
