package graft.functions

/** Ecosystem-aware version ordering.
  *
  * Re-expresses the semantics the reference gets from the `univers` library
  * (RANGE_CLASS_BY_SCHEMES, vulnerabilities/models.py:64-66): per-ecosystem
  * version comparison driving version_rank (SURVEY W1), next-non-vulnerable
  * (W3), nearest-fix as-of joins (J7/J8) and range membership (V1-V5).
  *
  * Spark-first design: instead of a comparator (unusable in a distributed
  * sort), every scheme compiles a version string into a **sortable key
  * string** whose lexicographic (UTF-16) order equals the scheme's version
  * order. Windows/sorts/joins then order by the key column — plain codegen'd
  * string comparisons, shuffle-friendly, no driver-side sorting.
  * `compare` is defined as key comparison, so sort order and comparison can
  * never diverge.
  *
  * Key encoding primitives:
  *   - numeric segment  → '#' + 2-digit length + digits  (bigint-safe)
  *   - alpha segment    → '@' + lowercased chars
  *   - scheme-specific low markers (..) sort below printables
  *   - terminators let "1.0~rc" sort BEFORE "1.0" (Debian-style)
  */
object VersionOrd {

  /** Schemes with dedicated semantics; anything else falls back to generic. */
  val schemes: Set[String] = Set(
    "semver", "npm", "cargo", "gem", "golang", "composer", "nginx", "hex",
    "pypi", "deb", "ubuntu", "rpm", "alpm", "nuget", "maven", "generic",
    "apk", "alpine", "ebuild", "openssl", "apache")

  private final val Term = '\u0004'      // global end-of-key sentinel
  private final val Low1 = '\u0001'      // sorts before everything
  private final val Low2 = '\u0002'
  private final val Low3 = '\u0003'
  private final val High = '\u00ff'      // sorts after any marker/printable
  private final val NumMark = '#'
  private final val AlphaMark = '@'

  private def encNum(digits: String): String = {
    val d = digits.dropWhile(_ == '0') match { case "" => "0"; case s => s }
    f"$NumMark${d.length}%02d$d"
  }
  private def encAlpha(s: String): String = AlphaMark + s.toLowerCase

  /** Split into alternating digit / non-digit runs. */
  private def runs(s: String): List[String] =
    if (s.isEmpty) Nil
    else {
      val isD = s.head.isDigit
      val (h, t) = s.span(_.isDigit == isD)
      h :: runs(t)
    }

  // ---------------------------------------------------------------- semver
  /** SemVer 2.0.0: MAJOR.MINOR.PATCH[-prerelease][+build]; prerelease sorts
    * before release; numeric prerelease ids < alphanumeric ids; build
    * metadata ignored.
    */
  private def semverKey(v0: String): String = {
    val v = v0.trim.stripPrefix("v").stripPrefix("V")
    val noBuild = v.takeWhile(_ != '+')
    val (core, pre) = noBuild.indexOf('-') match {
      case -1 => (noBuild, "")
      case i  => (noBuild.substring(0, i), noBuild.substring(i + 1))
    }
    val nums = core.split('.').toSeq.map(s => s.filter(_.isDigit) match {
      case "" => encNum("0")
      case d  => encNum(d)
    })
    // pad core to 3 components so "1.2" == "1.2.0"
    val padded = (nums ++ Seq.fill(3)(encNum("0"))).take(math.max(3, nums.size))
    val preKey =
      if (pre.isEmpty) High.toString // release: after any prerelease
      else Low1.toString + pre.split('.').map { id =>
        if (id.nonEmpty && id.forall(_.isDigit)) encNum(id) else encAlpha(id)
      }.mkString
    padded.mkString + preKey + Term
  }

  // ----------------------------------------------------------------- pypi
  /** PEP 440 (core subset): [epoch!]release[{a|b|rc}N][.postN][.devN].
    * Trailing-zero release segments are insignificant; dev < pre < final
    * < post. Local version segments compare lexically after everything.
    */
  private def pypiKey(v0: String): String = {
    val v = v0.trim.toLowerCase.stripPrefix("v")
    val (pub, local) = v.indexOf('+') match {
      case -1 => (v, "")
      case i  => (v.substring(0, i), v.substring(i + 1))
    }
    val (epoch, rest) = pub.indexOf('!') match {
      case -1 => ("0", pub)
      case i  => (pub.substring(0, i), pub.substring(i + 1))
    }
    // normalize separators and spellings
    val r = rest.replace('-', '.').replace('_', '.')
      .replace("alpha", "a").replace("beta", "b")
      .replace("preview", "rc").replace("pre", "rc").replace(".c", ".rc")
    // 'c' in the pre-release alternation: PEP 440 allows the bare
    // spelling "1.0c1" (== 1.0rc1) with NO separator, which the
    // ".c" -> ".rc" rewrite above cannot reach — without it the regex
    // failed, the fallback stripped "0c1" to "0", and 1.0c1 silently
    // keyed EQUAL to the final release 1.0 (so a fixed-at-1.0 advisory
    // marked the rc as already patched)
    val rx = raw"^([0-9.]+?)(?:\.?(a|b|c|rc)\.?([0-9]*))?(?:\.(post|r|rev)\.?([0-9]*))?(?:\.(dev)\.?([0-9]*))?$$".r
    val (release, preP, preN, postP, postN, devP, devN) = r match {
      case rx(rel, p1, n1, p2, n2, p3, n3) =>
        (rel, Option(p1), Option(n1).getOrElse(""), Option(p2),
          Option(n2).getOrElse(""), Option(p3), Option(n3).getOrElse(""))
      case _ => (r, None, "", None, "", None, "")
    }
    val relNums = release.split('.').filter(_.nonEmpty).map(_.takeWhile(_.isDigit))
      .filter(_.nonEmpty).map(BigInt(_))
    val trimmed = relNums.reverse.dropWhile(_ == 0).reverse
    val relKey = trimmed.map(n => encNum(n.toString)).mkString
    val num = (s: String) => encNum(if (s.isEmpty) "0" else s)
    // phase marker: dev-only '1' < a '2' < b '3' < rc '4' < final '5'
    val phase = preP match {
      case Some("a")         => "2" + num(preN)
      case Some("b")         => "3" + num(preN)
      case Some("c" | "rc")  => "4" + num(preN) // c is an rc spelling
      case None if devP.isDefined && postP.isEmpty => "1" + num(devN)
      case _          => "5"
    }
    // post: absent '0', present '1'+n ; dev within a pre/post phase:
    // present sorts before absent ('0' < '1')
    val post = postP.map(_ => "1" + num(postN)).getOrElse("0")
    val dev =
      if (preP.isEmpty && postP.isEmpty) "1" // consumed in phase or final
      else devP.map(_ => "0" + num(devN)).getOrElse("1")
    encNum(if (epoch.isEmpty) "0" else epoch) + Low2 + relKey + Low2 + phase +
      post + dev + encAlpha(local) + Term
  }

  // ------------------------------------------------------------------ deb
  /** Debian policy 5.6.12: [epoch:]upstream[-revision]; alternating
    * non-digit/digit parts; '~' sorts before everything including end of
    * part; letters sort before non-letters.
    */
  private def debChar(c: Char): Char =
    if (c == '~') Low1
    else if (c.isLetter) c.toLower
    else (0x100 + c.toInt).toChar // non-letter symbols after letters

  private def debPartKey(s: String): String = {
    // empty part still emits its end-of-nondigit marker so "" aligns with
    // the leading marker every non-empty part starts with ("" < "1")
    if (s.isEmpty) return Low2.toString
    val sb = new StringBuilder
    var rest = s
    var expectDigit = false
    while (rest.nonEmpty) {
      if (expectDigit) {
        val (d, t) = rest.span(_.isDigit)
        sb.append(encNum(if (d.isEmpty) "0" else d)); rest = t
      } else {
        val (a, t) = rest.span(!_.isDigit)
        a.foreach(c => sb.append(debChar(c)))
        sb.append(Low2) // end-of-nondigit-part: "" < any letter, but '~' < ""
        rest = t
      }
      expectDigit = !expectDigit
    }
    sb.toString
  }

  private def debKey(v0: String): String = {
    val v = v0.trim
    val (epoch, rest) = v.indexOf(':') match {
      case -1 => ("0", v)
      case i  => (v.substring(0, i), v.substring(i + 1))
    }
    val (upstream, revision) = rest.lastIndexOf('-') match {
      case -1 => (rest, "")
      case i  => (rest.substring(0, i), rest.substring(i + 1))
    }
    encNum(epoch.filter(_.isDigit) match { case "" => "0"; case e => e }) +
      debPartKey(upstream) + Low3 + debPartKey(revision) + Term
  }

  // ------------------------------------------------------------------ rpm
  /** rpmvercmp: digit/alpha segments, separators split segments;
    * '~' sorts before everything, '^' after base but before next segment.
    */
  private def rpmSegKey(s: String): String = {
    val sb = new StringBuilder
    var rest = s
    while (rest.nonEmpty) {
      rest.head match {
        case '~' => sb.append(Low1); rest = rest.tail
        case '^' => sb.append(Low3); rest = rest.tail
        case c if c.isDigit =>
          val (d, t) = rest.span(_.isDigit)
          sb.append(encNum(d)); rest = t
        case c if c.isLetter =>
          // rpmvercmp: an alpha segment sorts BEFORE a numeric segment,
          // so alpha gets a marker below NumMark ('#')
          val (a, t) = rest.span(_.isLetter)
          sb.append('\u0010').append(a.toLowerCase); rest = t
        case _ => rest = rest.tail // separator
      }
    }
    sb.toString
  }

  private def rpmKey(v0: String): String = {
    val v = v0.trim
    val (epoch, rest) = v.indexOf(':') match {
      case -1 => ("0", v)
      case i  => (v.substring(0, i), v.substring(i + 1))
    }
    encNum(epoch.filter(_.isDigit) match { case "" => "0"; case e => e }) +
      rpmSegKey(rest) + Low2 + Term
  }

  // ----------------------------------------------------------------- alpm
  /** pacman vercmp: derived from rpmvercmp (same digit/alpha segment
    * walk, epoch:) with ONE divergence — a trailing alpha segment makes
    * the version OLDER than its bare prefix (1.0a < 1.0 < 1.0.1), so the
    * alpha marker sorts below the end-of-version marker. */
  private def alpmSegKey(s: String): String = {
    val sb = new StringBuilder
    var rest = s
    while (rest.nonEmpty) {
      rest.head match {
        case c if c.isDigit =>
          val (d, t) = rest.span(_.isDigit)
          sb.append(encNum(d)); rest = t
        case c if c.isLetter =>
          val (a, t) = rest.span(_.isLetter)
          sb.append(Low1).append(a.toLowerCase); rest = t
        case _ => rest = rest.tail // separator
      }
    }
    sb.toString
  }

  private def alpmKey(v0: String): String = {
    val v = v0.trim
    val (epoch, rest) = v.indexOf(':') match {
      case -1 => ("0", v)
      case i  => (v.substring(0, i), v.substring(i + 1))
    }
    // pkgrel after '-' compares last, with the same rpm-style segment
    // walk pacman applies to it (so '1.5' is 1 then 5, not the digit
    // concatenation 15). DOCUMENTED DIVERGENCE from vercmp: pacman
    // IGNORES pkgrel when only one side carries it (vercmp '1.0'
    // '1.0-2' == 0) — a context-sensitive equality a total-order sort
    // key cannot encode, so a missing pkgrel keys as 0 here and
    // '1.0' < '1.0-2'. Callers comparing against pkgrel-less specs
    // should strip pkgrel from both sides first.
    val (pkgver, pkgrel) = rest.lastIndexOf('-') match {
      case -1 => (rest, "0")
      case i  => (rest.substring(0, i),
        if (rest.length == i + 1) "0" else rest.substring(i + 1))
    }
    encNum(epoch.filter(_.isDigit) match { case "" => "0"; case e => e }) +
      alpmSegKey(pkgver) + Low2 +
      alpmSegKey(pkgrel) + Term
  }

  // ---------------------------------------------------------------- maven
  private final val MQAlpha = '\u0011'
  private final val MQBeta = '\u0012'
  private final val MQMilestone = '\u0013'
  private final val MQRc = '\u0014'
  private final val MQSnapshot = '\u0015'
  private final val MQRelease = '\u0016'
  private final val MQSp = '\u0017'
  private final val MQOther = '\u0018'

  private val mavenQualifierRank: Map[String, Char] = Map(
    "alpha" -> MQAlpha, "a" -> MQAlpha,
    "beta" -> MQBeta, "b" -> MQBeta,
    "milestone" -> MQMilestone, "m" -> MQMilestone,
    "rc" -> MQRc, "cr" -> MQRc, "preview" -> MQRc,
    "snapshot" -> MQSnapshot,
    "" -> MQRelease, "final" -> MQRelease, "ga" -> MQRelease,
    "release" -> MQRelease,
    "sp" -> MQSp)

  /** Maven ComparableVersion (subset): dot/dash tokens, known qualifier
    * ranking, trailing zero/release tokens insignificant. Unknown
    * qualifiers sort after "sp" lexically (documented divergence from full
    * Maven ListItem recursion).
    */
  private def mavenKey(v0: String): String = {
    val toks = v0.trim.toLowerCase.split("[.-]").toSeq.filter(_.nonEmpty)
      .flatMap(runs) // also split digit/alpha transitions
    // numeric prefix vs qualifier tail: "1.0-snapshot" == ("1", snapshot)
    // because trailing zeros of the numeric part are insignificant even
    // when a qualifier follows (1.0-snapshot < 1 in Maven)
    val (nums, tail) = toks.span(_.forall(_.isDigit))
    val trimmedNums = nums.reverse.dropWhile(t => BigInt("0" + t) == 0).reverse
    val encTail = tail.map { tk =>
      if (tk.forall(_.isDigit)) encNum(tk)
      else mavenQualifierRank.get(tk).map(_.toString)
        .getOrElse(MQOther.toString + tk)
    }
    // trailing release-rank tokens are insignificant (1.0 == 1.0.ga)
    val strippedTail = encTail.reverse
      .dropWhile(e => e == MQRelease.toString || e == encNum("0")).reverse
    trimmedNums.map(encNum).mkString + strippedTail.mkString + MQRelease + Term
  }

  // --------------------------------------------------------------- alpine
  /** Alpine apk-tools ordering (the scheme the reference patches into
    * univers, models.py:87): numeric dotted core, optional trailing
    * letter, `_alpha/_beta/_pre/_rc` sort before release, `_p` (patch)
    * after, then `-rN` package revision. */
  private val alpineSuffixRank = Map(
    "alpha" -> '1', "beta" -> '2', "pre" -> '3', "rc" -> '4')

  private def alpineKey(v0: String): String = {
    val v = v0.trim.toLowerCase.stripPrefix("v")
    // split off -rN revision
    val (main, rev) = v.lastIndexOf("-r") match {
      case i if i >= 0 && v.drop(i + 2).nonEmpty &&
        v.drop(i + 2).forall(_.isDigit) => (v.take(i), v.drop(i + 2))
      case _ => (v, "0")
    }
    val (core, suffixes) = main.indexOf('_') match {
      case -1 => (main, Seq.empty[String])
      case i  => (main.take(i), main.drop(i + 1).split('_').toSeq)
    }
    // numeric segments + optional single trailing letter
    val (nums, letter) = core.split('.').toSeq.filter(_.nonEmpty)
      .partition(_.headOption.exists(_.isDigit)) match {
        case (ns, _) =>
          val last = ns.lastOption.getOrElse("")
          if (last.nonEmpty && last.last.isLetter)
            (ns.init :+ last.dropRight(1), last.last.toString)
          else (ns, "")
      }
    val numKey = nums.map(n => encNum(n.filter(_.isDigit) match {
      case "" => "0"; case d => d
    })).mkString
    val letterKey = if (letter.isEmpty) Low1.toString else "@" + letter
    // suffix phase: pre-release '1'-'4' < release '5' < patch '6'
    val suffixKey = suffixes.headOption match {
      case Some(s) =>
        val (word, num) = s.span(_.isLetter)
        alpineSuffixRank.get(word) match {
          case Some(r) => r.toString + encNum(
            if (num.isEmpty) "0" else num)
          case None if word == "p" => "6" + encNum(
            if (num.isEmpty) "0" else num)
          case None => "5"
        }
      case None => "5"
    }
    numKey + Low2 + letterKey + Low2 + suffixKey + encNum(rev) + Term
  }

  // ---------------------------------------------------------------- nuget
  /** NuGetVersion: up to four numeric parts (missing = 0, so
    * 1.0 == 1.0.0 == 1.0.0.0) with SemVer2 prerelease compared
    * CASE-INSENSITIVELY; build metadata ignored. */
  private def nugetKey(v0: String): String = {
    val v = v0.trim.stripPrefix("v").stripPrefix("V")
    val noBuild = v.takeWhile(_ != '+')
    val (core, pre) = noBuild.indexOf('-') match {
      case -1 => (noBuild, "")
      case i  => (noBuild.substring(0, i), noBuild.substring(i + 1))
    }
    val nums = core.split('.').toSeq.map(s => s.filter(_.isDigit) match {
      case "" => encNum("0")
      case d  => encNum(d)
    })
    val padded = (nums ++ Seq.fill(4)(encNum("0"))).take(math.max(4, nums.size))
    val preKey =
      if (pre.isEmpty) High.toString
      else Low1.toString + pre.toLowerCase.split('.').map { id =>
        if (id.nonEmpty && id.forall(_.isDigit)) encNum(id) else encAlpha(id)
      }.mkString
    padded.mkString + preKey + Term
  }

  // ------------------------------------------------------------- rubygems
  /** Rank of a zero segment followed by a positive number: above Term (so
    * `1.0.1` > `1`) while a zero followed by an alpha ranks below Term via
    * Low2 (so `1.0.b` < `1`). */
  private final val ZeroHigh = '\u0005'

  /** Gem::Version semantics: the version splits into digit/letter runs
    * (`-` first becomes `.pre.`), trailing zero segments are insignificant,
    * and comparison pads with zeros where String segments sort below
    * Integer ones (any letter ⇒ prerelease). Faithful per-position order:
    * alpha < zero-run-before-alpha < end < zero-run-before-number <
    * positive number — a zero's rank relative to end-of-version depends on
    * the first non-zero segment after it, hence the lookahead.
    */
  private def gemKey(v0: String): String = {
    val v = v0.trim.toLowerCase.stripPrefix("v").replace("-", ".pre.")
    val segs = "[0-9]+|[a-z]+".r.findAllIn(v).toList
    val isZero = (s: String) => s.forall(_.isDigit) && s.forall(_ == '0')
    val trimmed = segs.reverse.dropWhile(isZero).reverse
    val keys = trimmed.zipWithIndex.map { case (s, i) =>
      if (!s.forall(_.isDigit)) Low1.toString + s
      else if (!isZero(s)) encNum(s)
      else {
        val next = trimmed.drop(i + 1).find(t => !isZero(t))
        if (next.exists(t => !t.forall(_.isDigit))) Low2.toString
        else ZeroHigh.toString
      }
    }
    keys.mkString + Term
  }

  // -------------------------------------------------------------- openssl
  /** univers OpensslVersion (the scheme behind `vers:openssl/` ranges,
    * built by the reference's pipes/openssl.py:22-54 from CVE 5.x
    * records): a two-era order.
    *
    *  - LEGACY (major < 3): MAJOR.MINOR.BUILD plus an optional
    *    lowercase letter-patch suffix compared as a STRING after the
    *    numeric triple — `1.1.1 < 1.1.1a < … < 1.1.1z < 1.1.1za`
    *    (univers LegacyOpensslVersion's (major, minor, build, patch)
    *    tuple compare; the empty patch sorts first, and `z < za` by
    *    plain string order — OpenSSL really shipped 0.9.8za…0.9.8zh).
    *    Legacy has no prerelease grammar.
    *  - SEMVER era (major >= 3): full SemVer precedence, so
    *    `3.0.0-alpha1 < 3.0.0` and build metadata is ignored — both
    *    orderings the generic fallback got wrong.
    *  - Every legacy version sorts below every semver-era version
    *    (univers routes on `int(major) >= 3` and mixed-type compare
    *    makes the legacy side smaller), encoded as a leading era
    *    marker.
    *
    * Legacy prereleases: OpenSSL really shipped `1.0.0-beta1`…`beta5`
    * (and `-preN` spellings); the legacy grammar captures them sorting
    * BELOW the bare release and below any letter patch (release
    * history order). univers itself would route such strings through
    * its semver branch (LegacyOpensslVersion's grammar has no dash),
    * where the era-based mixed compare is a routing artifact rather
    * than order semantics — the historical order is the deliberate
    * reading here.
    *
    * Other unparseable legacy-era strings fall back to the generic
    * walk INSIDE the legacy band (univers would raise; a total sort
    * key cannot). */
  private def opensslKey(v0: String): String = {
    val v = v0.trim.toLowerCase.stripPrefix("v")
    val major = v.takeWhile(_.isDigit)
    val semverEra = major.nonEmpty && BigInt(major) >= 3
    if (semverEra) Low2.toString + semverKey(v)
    else {
      val legacyRx =
        raw"^(\d+)\.(\d+)\.(\d+)(?:[-_](?:beta|pre)(\d*)|([a-z]*))$$".r
      v match {
        case legacyRx(ma, mi, b, betaN, patch) =>
          // prerelease marker Low2 sorts below the release's empty
          // patch (encAlpha "" = '@') and below every letter patch
          val tail =
            if (betaN != null)
              Low2.toString + encNum(if (betaN.isEmpty) "0" else betaN)
            else encAlpha(patch)
          Low1.toString + encNum(ma) + encNum(mi) + encNum(b) +
            tail + Term
        case _ => Low1.toString + genericKey(v)
      }
    }
  }

  // --------------------------------------------------------------- apache
  /** univers ApacheVersion (the scheme behind `vers:apache/` ranges —
    * the reference's httpd/tomcat/kafka importers, importers/
    * apache_httpd.py:18,148, apache_tomcat.py:19,439): a SemverVersion
    * subclass whose value is `semantic_version.Version.coerce(string)`,
    * so ORDERING is SemVer precedence over the coerced form:
    *
    *  - the numeric core pads to three segments (`2.37` == `2.37.0`);
    *  - a FOURTH dotted numeric segment becomes build metadata
    *    (`0.10.2.2` → `0.10.2+2`) and build metadata is IGNORED by
    *    precedence, so `0.10.2.2` sort-TIES `0.10.2` — NOT greater, the
    *    way the old generic fallback read it;
    *  - a dash/glued suffix becomes a prerelease, below the release
    *    (`10.0.0-M4 < 10.0.0`, `3.3a` → `3.3.0-a < 3.3.0`) with SemVer
    *    identifier order (numeric ids numeric and below alphanumeric).
    *
    * Equality is NOT precedence: semantic_version `__eq__` includes the
    * build tuple (`0.10.2.2 != 0.10.2` but `== 0.10.2+2`), which a
    * total-order sort key cannot carry — [[eqKey]] appends the build
    * ids for the `=`/`!=` membership passes.
    *
    * Strings coerce cannot parse (no leading digit) raise in univers; a
    * total key cannot, so they fall back to the generic walk (same
    * documented divergence as openssl's legacy fallback). Prerelease
    * ids key case-INSENSITIVELY via the shared semver encoder — a
    * divergence from semantic_version's ASCII-ordinal id compare that
    * only surfaces when one boundary mixes cases (no captured apache
    * corpus does). */
  private val apacheBaseRx = raw"^\d+(?:\.\d+(?:\.\d+)?)?".r

  /** Emulates semantic_version.Version.coerce: returns
    * (3-padded numeric core, prerelease, build-ids string) or None when
    * coerce would raise (string does not start with a digit). */
  private def apacheCoerce(v0: String): Option[(Seq[String], String, String)] = {
    val v = v0.trim
    apacheBaseRx.findPrefixMatchOf(v).map { m =>
      val nums0 = m.matched.split('.').toSeq
      val nums = (nums0 ++ Seq.fill(3)("0")).take(3)
      if (m.end == v.length) (nums, "", "")
      else {
        // coerce sanitizes the tail to [a-zA-Z0-9+.-], '-' elsewhere
        val rest = v.substring(m.end).map(c =>
          if (c.isDigit || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            c == '+' || c == '.' || c == '-') c else '-')
        val (pre, build) = rest.head match {
          case '+' | '.' => ("", rest.tail)
          case '-' =>
            val r = rest.tail
            r.indexOf('+') match {
              case -1 => (r, "")
              case i  => (r.substring(0, i), r.substring(i + 1))
            }
          case _ =>
            rest.indexOf('+') match {
              case -1 => (rest, "")
              case i  => (rest.substring(0, i), rest.substring(i + 1))
            }
        }
        (nums, pre, build.replace('+', '.'))
      }
    }
  }

  private def apacheKey(v0: String): String =
    apacheCoerce(v0) match {
      case Some((nums, pre, _)) => // build metadata ignored by precedence
        val preKey =
          if (pre.isEmpty) High.toString
          else Low1.toString + pre.split('.').map { id =>
            if (id.nonEmpty && id.forall(_.isDigit)) encNum(id) else encAlpha(id)
          }.mkString
        nums.map(encNum).mkString + preKey + Term
      case None => genericKey(v0) // univers raises; a total key cannot
    }

  // -------------------------------------------------------------- generic
  /** Generic dotted comparison: digit runs numeric, alpha runs lexical,
    * numeric sorts before alpha at the same position, shorter prefix first.
    */
  private def genericKey(v0: String): String = {
    val v = v0.trim.toLowerCase.stripPrefix("v")
    v.split("[.\\-_+:]").toSeq.filter(_.nonEmpty).flatMap(runs).map { tk =>
      if (tk.forall(_.isDigit)) encNum(tk) else encAlpha(tk)
    }.mkString + Term
  }

  /** Bounded (scheme, version) → key memo. Version-keyed joins repeat
    * the same handful of version strings massively (every impact row
    * probes the same package's known versions), and a key derivation is
    * ~µs of parsing; a hit is ~30 ns. Capped like Vers.parseCached —
    * past 64k entries later arrivals just compute per call, so a
    * 100 TB scan of mostly-distinct versions degrades to the old cost
    * plus one map probe. */
  private val keyCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Sortable key string: lexicographic order == scheme version order. */
  def sortKey(scheme: String, version: String): String = {
    val ck = String.valueOf(scheme) + "\u0000" + String.valueOf(version)
    val hit = keyCache.get(ck)
    if (hit != null) return hit
    val r = sortKeyUncached(scheme, version)
    if (keyCache.size < 65536) keyCache.putIfAbsent(ck, r)
    r
  }

  private def sortKeyUncached(scheme: String, version: String): String = {
    val s = Option(scheme).getOrElse("generic").toLowerCase
    // Collapse surrogates (supplementary-plane chars) to the High
    // marker BEFORE any scheme key-building: keys must order the same
    // under Spark's UTF-8 binary comparison and Java's UTF-16
    // String.compareTo, and supplementary chars are the one BMP-exit
    // where those two orders disagree. No version-scheme grammar
    // admits them, so the deterministic collapse never touches a
    // parseable version. Pinned by VersionOrdPropSpec.
    val v0 = Option(version).getOrElse("")
    val v = if (v0.forall(!Character.isSurrogate(_))) v0
            else v0.map(c => if (Character.isSurrogate(c)) High else c)
    s match {
      // golang is NOT an alias of convenience: x/mod/semver.Compare is
      // plain SemVer 2.0 precedence, and pseudo-versions
      // (v0.0.0-20191109021931-daa7c04131f5) order correctly through it —
      // the 14-digit timestamp is one alphanumeric prerelease id whose
      // lexical order equals its numeric order (golang truth-table cases
      // in version_order_cases.jsonl pin this).
      case "semver" | "npm" | "cargo" | "golang" | "composer" |
          "nginx" | "hex" => semverKey(v)
      case "gem"            => gemKey(v)
      case "nuget"          => nugetKey(v)
      case "pypi"           => pypiKey(v)
      case "deb" | "debian" | "ubuntu" => debKey(v)
      case "rpm"            => rpmKey(v)
      case "alpm"           => alpmKey(v)
      // alpine's version scheme is derived from Gentoo's (PMS §3.3:
      // numeric parts, optional trailing letter, _alpha<_beta<_pre<_rc<
      // release<_p phases, -rN revision) — ebuild shares the key
      case "apk" | "alpine" | "ebuild" => alpineKey(v)
      case "maven"          => mavenKey(v)
      case "openssl"        => opensslKey(v)
      case "apache"         => apacheKey(v)
      case _                => genericKey(v)
    }
  }

  /** Scheme-aware comparison; defined via sortKey so sorts and compares
    * can never disagree. */
  def compare(scheme: String, a: String, b: String): Int =
    sortKey(scheme, a).compareTo(sortKey(scheme, b))

  /** True when the scheme's version EQUALITY is finer than its sort
    * order, i.e. [[eqKey]] differs from [[sortKey]]. Only apache today:
    * semantic_version ignores build metadata for <,<=,>,>= but includes
    * it in ==/!=. Consumers that fold `=` pins into key-bound intervals
    * (VersPureBoundsExpr) must skip such schemes. */
  def eqSensitive(scheme: String): Boolean =
    Option(scheme).exists(_.toLowerCase == "apache")

  /** Key whose EQUALITY matches the scheme's version `__eq__` — used by
    * the `=`/`!=` membership passes of Vers.contains. Identical to
    * sortKey for every scheme except apache, where the canonical build
    * ids append after a separator below any key char: `0.10.2.2` and
    * `0.10.2+2` share an eqKey, `0.10.2` does not (semantic_version
    * `__eq__` compares the build tuple verbatim — `+02` != `+2`). Only
    * key EQUALITY is meaningful here; relative order of eqKeys is
    * sortKey order with an arbitrary-but-deterministic build tiebreak. */
  def eqKey(scheme: String, version: String): String = {
    val base = sortKey(scheme, version)
    if (!eqSensitive(scheme)) base
    else apacheCoerce(Option(version).getOrElse("")) match {
      case Some((_, _, build)) if build.nonEmpty => base + Low3 + build
      case _ => base
    }
  }

  /** Canonical scheme-aware RENDERING of a version string — the analog
    * of the reference's `str(version_class(v))` round-trip, which every
    * improver output passes through (improvers/default.py:126
    * `str(version)` on univers objects). The only family whose univers
    * rendering differs from its raw string in the captured corpus is
    * apache: four dotted numerics render the last segment as build
    * metadata (`0.10.2.2` → `0.10.2+2`, univers ApacheVersion —
    * proven by the apache-kafka improver capture). Every other scheme
    * is identity here, as evidenced by the 17 other captured improver
    * sets matching without rendering. */
  def render(scheme: String, v: String): String =
    Option(scheme).map(_.toLowerCase) match {
      case Some("apache") =>
        // trailing empty segments drop first ("2.8.0." → "2.8.0" — the
        // kafka capture's upstream typo, normalized away by univers)
        val trimmed = Option(v).getOrElse("").reverse
          .dropWhile(_ == '.').reverse
        val parts = trimmed.split('.')
        if (parts.length == 4 &&
            parts.forall(p => p.nonEmpty && p.forall(_.isDigit)))
          parts.take(3).mkString(".") + "+" + parts(3)
        else trimmed
      case _ => v
    }
}
