package graft.functions

/** VERS version-range parsing and membership.
  *
  * Re-expresses the reference's `univers.version_range.VersionRange`
  * semantics (the `affecting_vers`/`fixed_vers` columns of ImpactedPackage,
  * models.py:3370-3470, and resolve_version_range, utils.py:353-390).
  *
  * A range spec is `vers:<scheme>/<constraint>|<constraint>|...` where each
  * constraint is one of `*`, `=v`, `!=v`, `>v`, `>=v`, `<v`, `<=v`.
  *
  * Membership (vers spec "containment" algorithm, interval form):
  *   1. `*` matches everything (minus `!=` exclusions);
  *   2. any `=` equal → IN, any `!=` equal → OUT;
  *   3. comparator constraints, sorted by version, form alternating
  *      lower/upper interval bounds; the version is IN iff it falls in one
  *      of the intervals (unbounded edges when the first bound is an upper
  *      or the last is a lower).
  * All comparisons use VersionOrd sort keys — so range membership and sort
  * order agree by construction.
  */
object Vers {

  sealed trait Constraint { def op: String; def version: String }
  private final case class C(op: String, version: String) extends Constraint

  final case class Range(scheme: String, constraints: Seq[Constraint]) {
    def spec: String =
      s"vers:$scheme/" + constraints.map(c =>
        if (c.op == "*") "*" else s"${c.op}${c.version}").mkString("|")
  }

  /** Parse `vers:scheme/constraints`; tolerant of a bare constraint list
    * with an explicit scheme arg (parseConstraints). */
  def parse(spec: String): Range = {
    val s = spec.trim
    require(s.startsWith("vers:"), s"not a vers spec: $spec")
    val body = s.stripPrefix("vers:")
    val slash = body.indexOf('/')
    require(slash > 0, s"missing scheme in vers spec: $spec")
    Range(body.substring(0, slash).toLowerCase,
      parseConstraints(body.substring(slash + 1)))
  }

  def parseConstraints(cs: String): Seq[Constraint] =
    cs.split('|').toSeq.map(_.trim).filter(_.nonEmpty).map { c =>
      if (c == "*") C("*", "")
      else if (c.startsWith(">=")) C(">=", c.drop(2))
      else if (c.startsWith("<=")) C("<=", c.drop(2))
      else if (c.startsWith("!=")) C("!=", c.drop(2))
      else if (c.startsWith(">")) C(">", c.drop(1))
      else if (c.startsWith("<")) C("<", c.drop(1))
      else if (c.startsWith("=")) C("=", c.drop(1))
      else C("=", c) // bare version ⇒ pin
    }

  /** Bounded spec-parse memo for the data-column range path: when the
    * spec is NOT a constant (so VersionInRangeExpr's fold-time parse
    * can't fire), the same range string still recurs massively — every
    * known version of a package probes the same impact row's spec in
    * the unfurl/improver joins. Distinct specs are advisory-bounded,
    * but cap the map anyway (64k entries ≈ a few MB per executor);
    * past the cap, later-arriving specs just parse per call. */
  private val parseCache =
    new java.util.concurrent.ConcurrentHashMap[String, Range]()

  def parseCached(spec: String): Range = {
    val hit = parseCache.get(spec)
    if (hit != null) hit
    else {
      val r = parse(spec)
      if (parseCache.size < 65536) parseCache.putIfAbsent(spec, r)
      r
    }
  }

  /** Is `version` within the range? */
  def contains(range: Range, version: String): Boolean = {
    val key = VersionOrd.sortKey(range.scheme, version)
    val cs = range.constraints
    if (cs.isEmpty) return false
    // equality / exclusion passes first (vers spec steps 2-3). These use
    // eqKey, not sortKey: univers evaluates `=`/`!=` with the version
    // class's __eq__, which for apache includes the build metadata that
    // precedence (and therefore sortKey) ignores — `!=0.10.2` must not
    // exclude 0.10.2.2 even though the two sort-tie. eqKey == sortKey
    // for every other scheme.
    val eqK = VersionOrd.eqKey(range.scheme, version)
    val eqKeys = cs.filter(_.op == "=")
      .map(c => VersionOrd.eqKey(range.scheme, c.version))
    val neqKeys = cs.filter(_.op == "!=")
      .map(c => VersionOrd.eqKey(range.scheme, c.version))
    if (neqKeys.contains(eqK)) return false
    if (eqKeys.contains(eqK)) return true
    if (cs.exists(_.op == "*")) return true
    // Interval walk over sorted comparators. Sort is by sortKey with
    // lower bounds FIRST on key ties: apache's build-metadata precedence
    // can sort-tie a lower/upper pair (e.g. `>=0.10.2|<0.10.2.2`), and a
    // stable spec-order tiebreak would make membership depend on the
    // spelling order — `<0.10.2.2|>=0.10.2` would read as (-inf,hi) plus
    // [lo,inf) = everything. Lower-first pairs the tie into one
    // (empty-at-the-tie) interval regardless of spec order.
    val comps = cs.filter(c => c.op != "=" && c.op != "!=" && c.op != "*")
      .map(c => (c.op, VersionOrd.sortKey(range.scheme, c.version)))
      .sortBy(c => (c._2, if (isLower(c._1)) 0 else 1))
    if (comps.isEmpty) return false
    var i = 0
    var in = false
    // leading upper bound ⇒ interval (-inf, bound]
    while (i < comps.length && !in) {
      val (op, ck) = comps(i)
      op match {
        case "<" | "<=" if i == 0 || !isLower(comps(i - 1)._1) =>
          // upper bound with no preceding open lower bound ⇒ unbounded below
          if (cmp(key, ck) < 0 || (op == "<=" && cmp(key, ck) == 0)) in = true
        case ">" | ">=" =>
          val lowOk = cmp(key, ck) > 0 || (op == ">=" && cmp(key, ck) == 0)
          if (lowOk) {
            // find the next upper bound, if any
            val upper = comps.drop(i + 1).find(c => !isLower(c._1))
            upper match {
              case None => in = true // unbounded above
              case Some((uop, uk)) =>
                if (cmp(key, uk) < 0 || (uop == "<=" && cmp(key, uk) == 0))
                  in = true
            }
          }
        case _ => ()
      }
      i += 1
    }
    in
  }

  private def isLower(op: String): Boolean = op == ">" || op == ">="
  private def cmp(a: String, b: String): Int = a.compareTo(b)

  /** Convenience: membership from raw strings. */
  def versionInRange(version: String, spec: String): Boolean =
    contains(parseCached(spec), version)

  /** V3 — exact-pin extraction: versions stated with `=` (and `!=`, which
    * the reference treats as known-fixed versions). Returns (pinned,
    * excluded) version lists. Reference: improvers/default.py:87-140,
    * pipes/univers_utils.py:23-95. */
  def exactVersions(spec: String): (Seq[String], Seq[String]) = {
    val r = parse(spec)
    (r.constraints.filter(_.op == "=").map(_.version),
      r.constraints.filter(_.op == "!=").map(_.version))
  }

  /** Constraint versions that themselves satisfy the range — the
    * "resolved versions" of the reference's get_exact_purls
    * (improvers/default.py:112-128): every constraint endpoint (any
    * comparator, not just pins) is a candidate, kept iff it is inside
    * the range. E.g. `vers:npm/<1.0.0|>=2.0.0|<3.0.0` resolves to
    * [2.0.0] — 1.0.0 and 3.0.0 are excluded endpoints. */
  def resolvedConstraintVersions(spec: String): Seq[String] = {
    val r = parse(spec)
    r.constraints.filter(c => c.op != "*" && c.version.nonEmpty)
      .map(_.version)
      .filter(v => contains(r, v))
  }
}
