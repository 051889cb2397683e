package graft.functions

/** Remaining scalar helpers (SURVEY F4/F19/F21/F22). */
object TextUtil {

  /** Markdown front-matter split (utils.py:91-107): returns
    * (frontMatterYaml, body). */
  def splitFrontMatter(text: String): (String, String) = {
    val t = Option(text).getOrElse("")
    if (!t.startsWith("---")) return ("", t)
    val rest = t.stripPrefix("---")
    val end = rest.indexOf("\n---")
    if (end < 0) ("", t)
    else (rest.substring(0, end).stripPrefix("\n").trim,
      rest.substring(end + 4).stripPrefix("\n"))
  }

  /** purl → map with empty-string defaults (utils.py:572-591). */
  def purlToDict(purl: String): Map[String, String] = {
    val p = PurlCodec.parse(purl)
    Map(
      "type" -> p.ptype,
      "namespace" -> p.namespace,
      "name" -> p.name,
      "version" -> p.version,
      "qualifiers" -> p.qualifiers.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString("&"),
      "subpath" -> p.subpath)
  }

  /** clean_summary (F6, importer.py:717-723): strip + NUL → U+FFFD. */
  def cleanSummary(s: String): String =
    // strip (Unicode whitespace), not Java trim: trim removes every char
    // <= U+0020 including the NULs Python's str.strip keeps -- an edge
    // NUL must survive to be replaced, exactly as in the reference.
    Option(s).getOrElse("").strip.replace('\u0000', '\ufffd')

  /** Commit-hash validation (utils.py is_commit). */
  def isCommit(s: String): Boolean =
    s != null && s.matches("^[0-9a-f]{7,40}$")

  /** VCS URL normalization subset (collect_commits.py:92-257):
    * npm-style shortcuts + scheme suffix cleanup. */
  /** npm-style VCS URL normalization
    * (collect_commits.py:110-175 normalize_vcs_url, identical in the v2
    * improver): a URL already carrying a VCS or plain scheme returns
    * VERBATIM (no .git strip, no scheme rewrite — the reference's
    * first branch), `git@host:path` rewrites to https:// for the known
    * hosters (git:// otherwise), the `github:`/`gitlab:`/`bitbucket:`/
    * `gist:` shortcuts expand, and a bare `user/repo` is implicit
    * GitHub. */
  def normalizeVcsUrl(url: String): String = {
    val u = Option(url).getOrElse("").trim
    val schemes = Seq("git://", "git+git://", "git+https://", "git+http://",
      "hg://", "hg+http://", "hg+https://", "svn://", "svn+https://",
      "svn+http://", "https://", "http://")
    if (u.isEmpty) u
    else if (schemes.exists(u.startsWith)) u
    else if (u.startsWith("git@")) {
      val right = u.substring(4)
      val (host, repo) =
        if (right.contains(':')) {
          val i = right.indexOf(':'); (right.substring(0, i), right.substring(i + 1))
        } else {
          val i = right.indexOf('/')
          if (i < 0) (right, "") else (right.substring(0, i), right.substring(i + 1))
        }
      val scheme = if (Seq("bitbucket", "gitlab", "github").exists(host.contains))
        "https" else "git"
      s"$scheme://$host/$repo"
    }
    else if (u.startsWith("github:")) s"https://github.com/${u.stripPrefix("github:")}"
    else if (u.startsWith("gitlab:")) s"https://gitlab.com/${u.stripPrefix("gitlab:")}"
    else if (u.startsWith("bitbucket:")) s"https://bitbucket.org/${u.stripPrefix("bitbucket:")}"
    else if (u.startsWith("gist:")) s"https://gist.github.com/${u.stripPrefix("gist:")}"
    else if (u.split('/').length == 2) s"https://github.com/$u"
    else u
  }

  /** Patch-source classification (F22, pipes/advisory.py:203-250):
    * a reference URL is a commit patch, a downloadable patch, or a plain
    * reference. */
  def classifyPatchSource(url: String): String = {
    val u = Option(url).getOrElse("")
    val commitLike = "/commit/([0-9a-f]{7,40})".r.findFirstIn(u).isDefined ||
      "/commits/([0-9a-f]{7,40})".r.findFirstIn(u).isDefined
    if (commitLike) "commit_patch"
    else if (u.endsWith(".patch") || u.endsWith(".diff")) "patch"
    else "reference"
  }
}
