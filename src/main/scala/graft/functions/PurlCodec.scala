package graft.functions

/** Package URL (purl) codec — parse / normalize / format.
  *
  * Re-expresses the reference's PackageURL handling: normalize_purl
  * (utils.py:594-600, models.py:927-950), plain_purl (utils.py:410-422),
  * update_purl_version (utils.py:157-173), purl_to_dict (utils.py:572-591).
  *
  * Follows the public purl spec: `pkg:type/namespace/name@version
  * ?qualifiers#subpath`; type lowercased; qualifier keys lowercased and
  * sorted; empty qualifier values dropped.
  */
object PurlCodec {

  final case class Purl(
      ptype: String,
      namespace: String,     // "" when absent
      name: String,
      version: String,       // "" when absent
      qualifiers: Map[String, String],
      subpath: String) {     // "" when absent

    /** Canonical string form, percent-encoded like packageurl-python's
      * `str(purl)` — the spelling the reference persists as
      * `package_url` and serves in responses. The captured sort golden
      * (test_data/package_sort/sorted_purls.txt) pins the observable
      * rules: `@` in a namespace renders `%40` (npm scoped packages),
      * `+` in a version renders `%2B` (debian revisions), while `:`
      * (alpm epochs), `~` (debian pre-releases), `.`/`-`/`_` and the
      * multi-segment namespace `/` stay raw. Encoding is minimal (the
      * structural characters plus `%` itself) rather than a full RFC
      * 3986 quote — every non-structural byte in the captured corpora
      * is passed through raw by the reference too. */
    def format: String = {
      val sb = new StringBuilder("pkg:")
      sb.append(ptype)
      if (namespace.nonEmpty) sb.append('/').append(enc(namespace))
      sb.append('/').append(enc(name))
      if (version.nonEmpty) sb.append('@').append(enc(version))
      if (qualifiers.nonEmpty)
        sb.append('?').append(qualifiers.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&"))
      if (subpath.nonEmpty) sb.append('#').append(enc(subpath))
      sb.toString
    }

    /** plain purl: qualifiers + subpath stripped (utils.py:410-422). */
    def plain: Purl = copy(qualifiers = Map.empty, subpath = "")

    /** update_purl_version (utils.py:157-173). */
    def withVersion(v: String): Purl = copy(version = v)

    /** Version-range scheme for this package type (univers
      * RANGE_CLASS_BY_SCHEMES subset). */
    def versionScheme: String =
      PurlCodec.SchemeByPtype.getOrElse(ptype, "generic")
  }

  /** The ONE ptype -> version-scheme table, shared by the scalar
    * [[Purl.versionScheme]] and the column twin
    * `GraftFunctions.purlVersionScheme` (a `typedLit` of this map) so
    * an added or fixed mapping can never split the two. */
  val SchemeByPtype: Map[String, String] = Map(
    "npm" -> "semver", "cargo" -> "semver", "composer" -> "semver",
    "hex" -> "semver", "gem" -> "gem", "golang" -> "golang",
    "nuget" -> "nuget", "alpm" -> "alpm", "ebuild" -> "ebuild",
    "pypi" -> "pypi", "deb" -> "deb", "rpm" -> "rpm", "maven" -> "maven",
    "apk" -> "alpine")

  /** Parse a purl string; throws IllegalArgumentException on malformed
    * input (callers route bad rows to the error channel). */
  def parse(purl: String): Purl = {
    val s = purl.trim
    require(s.startsWith("pkg:"), s"not a purl: $purl")
    var rest = s.stripPrefix("pkg:").dropWhile(_ == '/')
    // subpath
    // the subpath decodes like every other field (packageurl-python
    // unquotes it); '/' segments survive the round-trip because enc()
    // leaves '/' raw
    val (beforeSub, subpath) = rest.indexOf('#') match {
      case -1 => (rest, "")
      case i  => (rest.substring(0, i), decode(rest.substring(i + 1).trim))
    }
    // qualifiers
    val (beforeQ, qualStr) = beforeSub.indexOf('?') match {
      case -1 => (beforeSub, "")
      case i  => (beforeSub.substring(0, i), beforeSub.substring(i + 1))
    }
    val qualifiers = qualStr.split('&').toSeq.filter(_.contains("="))
      .map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i).toLowerCase -> decode(kv.substring(i + 1))
      }
      .filter(_._2.nonEmpty).toMap
    // version
    val (path, version) = beforeQ.lastIndexOf('@') match {
      case -1 => (beforeQ, "")
      case i  => (beforeQ.substring(0, i), decode(beforeQ.substring(i + 1)))
    }
    val segs = path.split('/').toSeq.filter(_.nonEmpty).map(decode)
    require(segs.length >= 2, s"purl needs type/name: $purl")
    val ptype = segs.head.toLowerCase
    val name = segs.last
    val namespace = segs.slice(1, segs.length - 1).mkString("/")
    require(name.nonEmpty, s"purl needs a name: $purl")
    Purl(ptype, namespace, normalizeName(ptype, name), version, qualifiers,
      subpath)
  }

  /** Minimal percent-encoding for one purl field (see [[Purl.format]]):
    * structural separators (`@ ? # &`), `+`, `%`, and whitespace encode;
    * `/` stays raw (multi-segment namespaces and subpaths keep it, and
    * it never reaches version/name fields from [[parse]]). */
  private def enc(s: String): String =
    if (s.forall(c => c != '@' && c != '?' && c != '#' && c != '&' &&
        c != '+' && c != '%' && !c.isWhitespace && !c.isControl)) s
    else {
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case c @ ('@' | '?' | '#' | '&' | '+' | '%') =>
          sb.append(f"%%${c.toInt}%02X")
        // control chars must encode like whitespace (urllib.parse.quote
        // encodes both): left raw, a decoded %00-%1F lands at a field
        // boundary where parse's trim strips it, so the canonical form
        // would not be a fixpoint of normalize
        case c if c.isWhitespace || c.isControl =>
          c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .foreach(b => sb.append(f"%%${b & 0xff}%02X"))
        case c => sb.append(c)
      }
      sb.toString
    }

  /** Round-trip normalization (models.py:927-950 save()-time normalize). */
  def normalize(purl: String): String = parse(purl).format

  private def normalizeName(ptype: String, name: String): String =
    ptype match {
      // per purl spec these types have case-insensitive names. golang
      // is case-insensitive ON PAPER but packageurl-python (what the
      // reference runs) preserves its case — the captured sort golden
      // keeps "1Panel-dev/1Panel" — so the engine preserves it too
      case "pypi"         => name.toLowerCase.replace('_', '-')
      case "deb" | "npm" => name.toLowerCase
      case _              => name
    }

  private def decode(s: String): String = {
    // percent-decoding (purl spec allows %XX escapes). The escapes are
    // UTF-8 BYTES: consecutive %XX runs must be collected and decoded
    // as one UTF-8 sequence — mapping each byte to a char directly
    // turns "caf%C3%A9" into "cafÃ©" (mojibake) and splits the purl's
    // identity between its encoded and raw spellings.
    if (!s.contains('%')) s
    else {
      val sb = new StringBuilder
      val bytes = new java.io.ByteArrayOutputStream(8)
      def flushBytes(): Unit = if (bytes.size() > 0) {
        sb.append(new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
        bytes.reset()
      }
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '%' && i + 2 <= s.length - 1) {
          try {
            bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
            i += 3
          } catch {
            case _: NumberFormatException =>
              flushBytes(); sb.append(s.charAt(i)); i += 1
          }
        } else { flushBytes(); sb.append(s.charAt(i)); i += 1 }
      }
      flushBytes()
      sb.toString
    }
  }
}
