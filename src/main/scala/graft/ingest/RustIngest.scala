package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Vers, VersionOrd}
import graft.model._

/** RustSec advisory-db ingestion — legacy v1 importer
  * (importers/rust.py:31-241), implemented for registry completeness
  * even though the reference's active registry no longer loads it (the
  * RustSec flow arrives via the OSV/github_osv family today; rust.py
  * itself imports the long-deleted `package_managers` module, so it no
  * longer even loads in the reference tree).
  *
  * Advisories are Markdown files with TOML front matter inside a
  * ```` ```toml ```` fence (rust.py:184-241). The crate's known version
  * list — the reference pulls it live from the crates.io API
  * (CratesVersionAPI) — is modeled as an INPUT TABLE `(crate, version,
  * released_at)`: the Spark-first shape for a package-manager catalog,
  * broadcast onto the parsed advisories (small dim vs the corpus).
  * Versions released after the advisory date are excluded, mirroring
  * `crates_api.get(crate, publish_date).valid_versions`; a null
  * released_at means "date unknown" and is kept.
  *
  * categorize_versions (rust.py:139-183) is ported faithfully,
  * including its own TODO-marked quirks: a version counts as affected
  * only when ALL affected ranges contain it, and versions left
  * uncategorized default to affected exactly when no affected range was
  * given. Wildcard "*" ranges are skipped (rust.py:93-95). The Markdown
  * body below the fence is ignored, like the reference (summary comes
  * from the TOML `description` key, absent in the modern format).
  */
object RustIngest {

  // ---- TOML front-matter subset ------------------------------------
  // RustSec front matter uses: [table] / [table.sub] headers, string /
  // array-of-string / bare-scalar values, quoted keys (function paths in
  // [affected.functions]), and arrays that may span lines. That subset
  // is parsed here; toml.loads-equivalent for these files
  // (rust.py:211-227).

  /** Lines of the ```toml fence (rust.py:184-209): the opening fence
    * line is skipped, the closing fence stops the stream, everything
    * else — including lines BEFORE the fence, like the reference —
    * streams through. */
  def tomlLines(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val it = text.linesIterator
    var done = false
    while (it.hasNext && !done) {
      val line = it.next().trim
      if (line.startsWith("```toml")) () // opening fence: skipped
      else if (line.endsWith("```")) done = true
      else out += line
    }
    out.result()
  }

  /** Split a TOML array body `"a", "b"` → elements (strings unquoted). */
  private def arrayElems(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val s = body.trim
    while (i < s.length) {
      s.charAt(i) match {
        case '"' =>
          val j = s.indexOf('"', i + 1)
          if (j < 0) return out.result()
          out += s.substring(i + 1, j)
          i = j + 1
        case ',' | ' ' | '\t' => i += 1
        case _ =>
          val j = s.indexWhere(c => c == ',' || c == ']', i)
          val end = if (j < 0) s.length else j
          val tok = s.substring(i, end).trim
          if (tok.nonEmpty) out += tok
          i = end + 1
      }
    }
    out.result()
  }

  /** Index of the first `]` OUTSIDE double quotes, -1 if none — the
    * array terminator scan must not trip on a `]` inside a quoted
    * element (rust function paths like `<[u8]>::method`). */
  private def unquotedBracket(s: String): Int = {
    var i = 0
    var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') inQ = !inQ
      else if (c == ']' && !inQ) return i
      i += 1
    }
    -1
  }

  /** Key = bare ident or quoted string (function paths carry `:`/`.`). */
  private def splitKeyValue(line: String): Option[(String, String)] = {
    if (line.startsWith("\"")) {
      val close = line.indexOf('"', 1)
      if (close < 0) return None
      val eq = line.indexOf('=', close)
      if (eq < 0) return None
      Some((line.substring(1, close), line.substring(eq + 1).trim))
    } else {
      val eq = line.indexOf('=')
      if (eq <= 0) None
      else Some((line.substring(0, eq).trim, line.substring(eq + 1).trim))
    }
  }

  /** TOML subset → nested section map:
    * section path (e.g. "affected.functions") → key → value
    * (String or Seq[String]). */
  def parseToml(lines: Seq[String]): Map[String, Map[String, Any]] = {
    var section = ""
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, Any]]
    def sec = acc.getOrElseUpdate(section,
      scala.collection.mutable.LinkedHashMap.empty[String, Any])
    var i = 0
    val ls = lines.toIndexedSeq
    while (i < ls.length) {
      var line = ls(i).trim
      if (line.isEmpty || line.startsWith("#")) ()
      else if (line.startsWith("[") && line.endsWith("]"))
        section = line.substring(1, line.length - 1).trim
      else splitKeyValue(line) match {
        case Some((key, v0)) =>
          var v = v0
          if (v.startsWith("[")) {
            // array, possibly spanning lines until the closing bracket
            // (quote-aware: a ']' inside an element must not terminate)
            while (unquotedBracket(v) < 0 && i + 1 < ls.length) {
              i += 1; v = v + " " + ls(i).trim
            }
            sec.put(key,
              arrayElems(v.substring(1, unquotedBracket(v).max(1))))
          } else if (v.startsWith("\"")) {
            val close = v.indexOf('"', 1)
            sec.put(key, if (close > 0) v.substring(1, close) else "")
          } else {
            // bare scalar (date, number, bool); strip a trailing comment
            val hash = v.indexOf('#')
            sec.put(key, (if (hash >= 0) v.substring(0, hash) else v).trim)
          }
        case None => ()
      }
      i += 1
    }
    acc.iterator.map { case (k, m) => (k, m.toMap) }.toMap
  }

  // ---- categorize_versions (rust.py:139-183) ------------------------

  /** Expand a semver caret/tilde requirement token into its bound
    * pair. `^1.2.3` → [1.2.3, 2.0.0); `^0.2.3` → [0.2.3, 0.3.0);
    * `^0.0.3` → [0.0.3, 0.0.4); `~1.2.3` → [1.2.3, 1.3.0);
    * `~1.2`/`~1` widen at their own grain — the cargo semver-req
    * rules RustSec ranges are written in. */
  private[ingest] def caretTildeBounds(tok: String): Seq[String] = {
    val op = tok.head
    val v = tok.tail.trim
    val parts = v.takeWhile(c => c.isDigit || c == '.')
      .split('.').filter(_.nonEmpty).map(_.toLong)
    if (parts.isEmpty) return Seq("=" + v)
    val upper: Seq[Long] =
      if (op == '^') {
        if (parts(0) != 0L || parts.length == 1) Seq(parts(0) + 1)
        else if (parts(1) != 0L || parts.length == 2)
          Seq(0L, parts(1) + 1)
        else Seq(0L, 0L, parts(2) + 1)
      } else { // '~': bump the second-to-last given segment
        if (parts.length >= 2) Seq(parts(0), parts(1) + 1)
        else Seq(parts(0) + 1)
      }
    Seq(">=" + v, "<" + upper.mkString("."))
  }

  /** `version in range` for one spec string (">= 0.6.1", "< 0.4.0",
    * "^1.0.5", comma-AND pairs) — univers' semver
    * from_scheme_version_spec_string semantics; comma pairs flatten to
    * the vers interval walk. Caret/tilde requirements expand to their
    * bound pairs first (GitlabIngest.rangeConstraints knows gem's `~>`
    * but not cargo's `^`/`~`, which would otherwise fall through as
    * never-matching literal pins). */
  def semverContains(spec: String, version: String): Boolean = {
    // comma tokens are a CONJUNCTION (univers VersionRange semantics):
    // each token must contain the version. Per token the expansion is
    // at most a (>=lo, <hi) pair, which the vers interval walk reads as
    // one interval — flattening ALL tokens into one walk instead would
    // read a second upper bound as a new interval (OR), e.g.
    // "^1.0.0, < 1.5.0" would admit 1.5.0.
    val tokens = spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    tokens.nonEmpty && tokens.forall { tok =>
      val cons =
        if ((tok.startsWith("^") || tok.startsWith("~")) &&
            !tok.startsWith("~>")) caretTildeBounds(tok)
        else GitlabIngest.rangeConstraints(tok)
      cons.nonEmpty && Vers.contains(
        Vers.Range("semver", Vers.parseConstraints(cons.mkString("|"))),
        version)
    }
  }

  /** → (unaffected, affected) version sets. */
  def categorizeVersions(allVersions: Set[String],
      unaffectedRanges: Seq[String], affectedRanges: Seq[String],
      resolvedRanges: Seq[String]): (Set[String], Set[String]) = {
    if (unaffectedRanges.isEmpty && affectedRanges.isEmpty &&
        resolvedRanges.isEmpty)
      return (Set.empty, Set.empty)
    var unaffected = Set.empty[String]
    var affected = Set.empty[String]
    for (v <- allVersions) {
      if (affectedRanges.nonEmpty &&
          affectedRanges.forall(semverContains(_, v)))
        affected += v
      else if (unaffectedRanges.nonEmpty &&
          unaffectedRanges.forall(semverContains(_, v)))
        unaffected += v
      else if (resolvedRanges.nonEmpty &&
          resolvedRanges.forall(semverContains(_, v)))
        unaffected += v
    }
    val uncategorized = allVersions -- unaffected -- affected
    if (uncategorized.nonEmpty) {
      if (affectedRanges.isEmpty) affected ++= uncategorized
      else unaffected ++= uncategorized
    }
    (unaffected, affected)
  }

  // ---- per-file parse ------------------------------------------------

  final case class RustRaw(
      datasource_id: String,
      crate: String,
      advisory_id: String,
      cve_id: String,            // "" when no CVE alias
      summary: String,
      advisory_url: String,      // "" when absent
      date: String,              // bare TOML date, yyyy-mm-dd
      affected_fns: Seq[String], // [affected.functions] ranges, flattened
      unaffected: Seq[String],
      patched: Seq[String])

  private def strs(v: Any): Seq[String] = v match {
    case s: Seq[_] => s.map(String.valueOf)
    case null => Seq.empty
    case o => Seq(String.valueOf(o))
  }

  /** Front matter → RustRaw (rust.py:79-135 up to the API call). */
  def parseOne(datasourceId: String, path: String, text: String)
      : Option[RustRaw] = {
    // rust.py:58: `RUSTSEC-0000-0000.md` placeholders are skipped
    if (path.endsWith("-0000.md")) return None
    val doc = parseToml(tomlLines(text))
    val adv = doc.getOrElse("advisory", Map.empty)
    val crate = adv.get("package").map(String.valueOf)
      .getOrElse(return None)
    val id = adv.get("id").map(String.valueOf).getOrElse(return None)
    val aliases = strs(adv.getOrElse("aliases", Seq.empty[String]))
    val versions = doc.getOrElse("versions", Map.empty)
    Some(RustRaw(
      datasourceId, crate, id,
      cve_id = aliases.find(_.startsWith("CVE-")).getOrElse(""),
      summary = adv.get("description").map(String.valueOf).getOrElse(""),
      advisory_url = adv.get("url").map(String.valueOf).getOrElse(""),
      date = adv.get("date").map(String.valueOf).getOrElse(""),
      affected_fns = doc.getOrElse("affected.functions", Map.empty)
        .values.toSeq.flatMap(strs).filter(_ != "*"),
      unaffected = strs(versions.getOrElse("unaffected",
        Seq.empty[String])).filter(_ != "*"),
      patched = strs(versions.getOrElse("patched", Seq.empty[String]))
        .filter(_ != "*")))
  }

  /** Raw + the crate's valid versions → AdvisoryRow (rust.py:96-135). */
  def toAdvisory(raw: RustRaw, validVersions: Seq[String],
      precedence: Int): AdvisoryRow = {
    val (unaffectedVs, affectedVs) = categorizeVersions(
      validVersions.toSet, raw.unaffected, raw.affected_fns, raw.patched)
    val purl = s"pkg:cargo/${raw.crate}"
    def pin(v: String) = s"vers:cargo/=$v"
    // nearest_patched_package over concrete cargo versions — sort both
    // sides by cargo ordering, bisect-right each affected version
    val rSorted = unaffectedVs.toSeq
      .sortBy(VersionOrd.sortKey("cargo", _))
    val rKeys = rSorted.map(VersionOrd.sortKey("cargo", _))
    val affected = affectedVs.toSeq
      .sortBy(VersionOrd.sortKey("cargo", _)).map { v =>
        val i = rKeys.indexWhere(_ > VersionOrd.sortKey("cargo", v))
        AffectedRow(purl, pin(v),
          if (i >= 0) pin(rSorted(i)) else "")
      }
    val refs =
      (if (raw.advisory_url.nonEmpty)
        Seq(ReferenceRow(raw.advisory_url, "", "")) else Seq.empty) :+
      ReferenceRow(
        s"https://rustsec.org/advisories/${raw.advisory_id}.html",
        "", raw.advisory_id)
    val published =
      try Some(Timestamp.valueOf(
        java.time.LocalDate.parse(raw.date).atStartOfDay()))
      catch { case _: Exception => None }
    AdvisoryRow(raw.datasource_id, raw.advisory_id, raw.summary,
      aliases = (Seq(raw.advisory_id) ++
        Some(raw.cve_id).filter(_.nonEmpty)).distinct,
      references = refs,
      severities = Seq.empty, weaknesses = Seq.empty,
      affected = affected,
      date_collected = new Timestamp(0L),
      date_published = published,
      url = s"https://rustsec.org/advisories/${raw.advisory_id}.html",
      precedence = precedence)
  }

  /** raw: (datasource_id, path, text); crateVersions: (crate, version,
    * released_at TIMESTAMP nullable) — the crates.io catalog as a dim
    * table, broadcast onto the advisories. */
  def parse(spark: SparkSession, raw: DataFrame,
      crateVersions: DataFrame, precedence: Int = 500)
      : Dataset[AdvisoryRow] = {
    import spark.implicits._
    val parsed = raw.select("datasource_id", "path", "text")
      .as[(String, String, String)]
      .flatMap { case (ds, path, text) => parseOne(ds, path, text) }
    val versionsByCrate = crateVersions
      .groupBy(col("crate"))
      .agg(collect_list(struct(col("version"),
        col("released_at").cast("timestamp"))).as("vs"))
    parsed.join(broadcast(versionsByCrate),
        parsed("crate") === versionsByCrate("crate"), "left")
      .select(parsed("*"), col("vs"))
      .as[(String, String, String, String, String, String, String,
        Seq[String], Seq[String], Seq[String],
        Seq[(String, Option[Timestamp])])]
      .map { case (ds, crate, id, cve, summary, url, date, fns, unaff,
          patched, vs) =>
        // publish_date is midnight UTC of the advisory date
        // (rust.py:89); releases strictly after it are not yet known
        val cutoff =
          try Some(java.time.LocalDate.parse(date)
            .atStartOfDay().toInstant(java.time.ZoneOffset.UTC))
          catch { case _: Exception => None }
        val valid = Option(vs).getOrElse(Seq.empty).collect {
          case (v, rel) if rel.isEmpty || cutoff.isEmpty ||
            !rel.get.toInstant.isAfter(cutoff.get) => v
        }
        toAdvisory(RustRaw(ds, crate, id, cve, summary, url, date,
          fns, unaff, patched), valid, precedence)
      }
  }
}
