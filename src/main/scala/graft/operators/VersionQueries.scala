package graft.operators

import graft.core.{QueryEntry, QueryModule, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.8 — vers/version-range operators (V1–V6), the domain core.
  *
  * Synthetic version strings are derived deterministically from `part`
  * (`p_size . p_partkey%10 . p_partkey%7` as semver) so the DuckDB oracle
  * can re-express membership numerically — the gate then checks the Scala
  * VersionOrd/Vers implementations against an independent arithmetic
  * formulation.
  *
  * Reference: utils.py:353-390 (V1 resolve_version_range),
  * v2_improvers/unfurl_version_range.py:54-212 (V2 unfurl),
  * improvers/default.py:87-140 (V3 exact pins), importer.py:360-391
  * (V4 merge), utils.py:482-509 (V5 nginx rule), models.py:1021-1024
  * (V6 version ordering).
  */
object VersionQueries extends QueryModule {

  private def withVersion(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part").withColumn("version",
      concat_ws(".", col("p_size"), pmod(col("p_partkey"), lit(10)),
        pmod(col("p_partkey"), lit(7))))

  private val versionSqlCols =
    "p_size AS v1, p_partkey % 10 AS v2, p_partkey % 7 AS v3"
  private val versionSql =
    "p_size || '.' || (p_partkey % 10) || '.' || (p_partkey % 7)"

  override val entries: Seq[QueryEntry] = Seq(
    // V1 — resolve_version_range: partition concrete versions against a range
    q("v1_resolve_range",
      s"""SELECT p_partkey, $versionSql AS version,
         |       ((p_size, p_partkey % 10, p_partkey % 7) >= (10, 0, 0) AND
         |        (p_size, p_partkey % 10, p_partkey % 7) < (40, 5, 0))
         |         AS affected
         |FROM part ORDER BY p_partkey""") { (s, dir) =>
      withVersion(s, dir)
        .select(col("p_partkey"), col("version"),
          GraftFunctions.versionInRange(col("version"),
            lit("vers:semver/>=10.0.0|<40.5.0")).as("affected"))
        .orderBy("p_partkey")
    },

    // V2 — unfurl: impacts×versions-dimension join filtered by membership.
    // Ranges derived per p_type (>= min_size.0.0, < max_size.0.0); the
    // versions dimension is every concrete part version of that type.
    // Scale note: the versions dimension is joined on the group key first
    // (equi-join), membership filters the joined rows — never a cross join.
    q("v2_unfurl",
      """SELECT p.p_type, p.p_partkey
        |FROM part p
        |JOIN (SELECT p_type, min(p_size) AS lo, max(p_size) AS hi
        |      FROM part GROUP BY p_type) r
        |  ON p.p_type = r.p_type
        |WHERE (p.p_size, p.p_partkey % 10, p.p_partkey % 7) >= (r.lo, 0, 0)
        |  AND (p.p_size, p.p_partkey % 10, p.p_partkey % 7) < (r.hi, 0, 0)
        |ORDER BY p.p_type, p.p_partkey""") { (s, dir) =>
      val versions = withVersion(s, dir)
      val ranges = Tables(s, dir, "part")
        .groupBy(col("p_type").as("r_type"))
        .agg(min("p_size").as("lo"), max("p_size").as("hi"))
        .withColumn("vers_spec",
          concat(lit("vers:semver/>="), col("lo"), lit(".0.0|<"), col("hi"),
            lit(".0.0")))
      versions.join(broadcast(ranges), col("p_type") === col("r_type"))
        .filter(GraftFunctions.versionInRange(col("version"), col("vers_spec")))
        .select("p_type", "p_partkey")
        .orderBy("p_type", "p_partkey")
    },

    // V3 — exact-pin extraction from range constraints, exploded
    q("v3_exact_pins",
      """SELECT p_partkey, p_size || '.0.0' AS pinned FROM part
        |ORDER BY p_partkey""") { (s, dir) =>
      val withSpec = Tables(s, dir, "part")
        .withColumn("spec",
          concat(lit("vers:semver/="), col("p_size"),
            lit(".0.0|>="), col("p_size") + 1, lit(".0.0|!="), col("p_size") + 2,
            lit(".0.0")))
      withSpec
        .select(col("p_partkey"),
          explode(GraftFunctions.versExactPinsUdf(col("spec"))).as("pinned"))
        .orderBy("p_partkey")
    },

    // V4 — AffectedPackage.merge: distinct versions per group, sorted by
    // ECOSYSTEM order (not lexically) via the sort-key column
    q("v4_merge_versions",
      s"""SELECT p_brand, string_agg(version, '|' ORDER BY v1, v2, v3) AS versions
         |FROM (SELECT DISTINCT p_brand, $versionSqlCols,
         |             $versionSql AS version FROM part)
         |GROUP BY p_brand ORDER BY p_brand""") { (s, dir) =>
      withVersion(s, dir)
        .select(col("p_brand"),
          struct(
            GraftFunctions.versionSortKey(lit("semver"), col("version"))
              .as("sk"),
            col("version")).as("kv"))
        .distinct()
        .groupBy("p_brand")
        .agg(array_join(transform(array_sort(collect_list("kv")),
          x => x.getField("version")), "|").as("versions"))
        .orderBy("p_brand")
    },

    // V5 — nginx vulnerability rule: in vulnerable range AND no fixed
    // version ≥ it within the same branch (utils.py:482-509)
    q("v5_nginx_rule",
      s"""SELECT p.p_partkey,
         |       ((p.p_size, p.p_partkey % 10, p.p_partkey % 7) >= (15, 0, 0)
         |        AND (p.p_size, p.p_partkey % 10, p.p_partkey % 7) < (45, 0, 0)
         |        AND NOT EXISTS (
         |          SELECT 1 FROM part f
         |          WHERE f.p_brand = p.p_brand AND f.p_size % 5 = 0
         |            AND (f.p_size, f.p_partkey % 10, f.p_partkey % 7) >=
         |                (p.p_size, p.p_partkey % 10, p.p_partkey % 7)))
         |         AS vulnerable
         |FROM part p ORDER BY p.p_partkey""") { (s, dir) =>
      val v = withVersion(s, dir).withColumn("sk",
        GraftFunctions.versionSortKey(lit("semver"), col("version")))
      val fixes = v.filter(pmod(col("p_size"), lit(5)) === 0)
        .groupBy(col("p_brand").as("f_brand"))
        .agg(max("sk").as("max_fix_sk"))
      v.join(broadcast(fixes), col("p_brand") === col("f_brand"), "left")
        .select(col("p_partkey"),
          (GraftFunctions.versionInRange(col("version"),
            lit("vers:semver/>=15.0.0|<45.0.0")) &&
            !(col("max_fix_sk").isNotNull && col("max_fix_sk") >= col("sk")))
            .as("vulnerable"))
        .orderBy("p_partkey")
    },

    // V6/W1 — ecosystem version_rank: windows order by the sort key column
    q("v6_version_rank",
      s"""SELECT p_brand, p_partkey, version FROM (
         |  SELECT p_brand, p_partkey, $versionSql AS version,
         |         row_number() OVER (PARTITION BY p_brand
         |           ORDER BY p_size, p_partkey % 10, p_partkey % 7, p_partkey)
         |           AS version_rank
         |  FROM part) WHERE version_rank = 1
         |ORDER BY p_brand""") { (s, dir) =>
      val v = withVersion(s, dir).withColumn("sk",
        GraftFunctions.versionSortKey(lit("semver"), col("version")))
      val w = Window.partitionBy("p_brand").orderBy(col("sk"), col("p_partkey"))
      v.withColumn("version_rank", row_number().over(w))
        .filter(col("version_rank") === 1)
        .select("p_brand", "p_partkey", "version")
        .orderBy("p_brand")
    },
    // V7 — native Catalyst expression path: same membership as V1 but via
    // version_in_range_native + the ConstantVersionRangeRewrite rule
    // (the optimizer turns the constant range into sort-key bounds)
    q("v7_native_range",
      s"""SELECT p_partkey FROM part
         |WHERE p_size >= 10
         |  AND (p_size < 40 OR (p_size = 40 AND p_partkey % 10 < 5))
         |ORDER BY p_partkey""") { (s, dir) =>
      withVersion(s, dir)
        .filter(expr(
          "version_in_range_native(version, 'vers:semver/>=10.0.0|<40.5.0')"))
        .select("p_partkey")
        .orderBy("p_partkey")
    },
    // V8 — same membership as V7 but through the version-KEYED parquet
    // layout: the sort key is materialized (+ metadata-tagged) at write
    // time, so ConstantVersionRangeRewrite + MaterializedVersionKeyRewrite
    // turn the range filter into plain string bounds on a stored column —
    // the predicate lands in PushedFilters and parquet row-group min/max
    // stats skip non-matching groups (VersionPushdownSpec pins the plan).
    // The oracle re-derives membership arithmetically from the RAW part
    // table: the keyed write must be a pure re-layout, never a
    // re-interpretation, of the data.
    q("v8_keyed_pushdown",
      s"""SELECT p_partkey FROM part
         |WHERE p_size >= 10
         |  AND (p_size < 40 OR (p_size = 40 AND p_partkey % 10 < 5))
         |ORDER BY p_partkey""") { (s, dir) =>
      // per-JVM path, deleted at JVM exit; pid suffix so concurrent
      // driver JVMs can't clobber each other (see core.Scratch)
      val path = graft.core.Scratch.perJvmDir("version_keyed")
      graft.sources.VersionKeyed.write(
        withVersion(s, dir).select("p_partkey", "version"),
        "version", "semver", path)
      graft.sources.VersionKeyed.read(s, path)
        .filter(expr(
          "version_in_range_native(version, 'vers:semver/>=10.0.0|<40.5.0')"))
        .select("p_partkey")
        .orderBy("p_partkey")
    },
  )
}
