package graft.functions

/** Loader for bundled two-column TSV dimension resources (severity
  * weights, CWE catalog): one `key<TAB>value` row per line, parsed once
  * per JVM by the caller's `lazy val`. Shared so fixes to the
  * read/validate/close path (charset, malformed-row diagnostics) reach
  * every catalog at once.
  */
object TsvResource {

  /** Parse the classpath resource at `path` into key→value pairs via
    * `parse(left-of-first-tab, right-of-first-tab)`. Fails fast on a
    * missing resource or a tab-less row. */
  def load[K, V](path: String)(parse: (String, String) => (K, V)): Map[K, V] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty)
        .map { line =>
          val i = line.indexOf('\t')
          require(i > 0, s"malformed row in $path: $line")
          parse(line.substring(0, i), line.substring(i + 1))
        }
        .toMap
    } finally in.close()
  }
}
