package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The bundled CWE weakness catalog (models.py:552-582 resolves ids via
  * the cwe2 package; here the public MITRE id→name data is a bundled
  * TSV dimension).
  */
class CweCatalogSpec extends AnyFunSuite {

  test("catalog loads and covers the public CWE list broadly") {
    // widened toward the full public catalog (the reference resolves
    // ~1,000 ids through the cwe2 DB); real lookups above id 200 must
    // resolve, not fall back to 'unknown'
    assert(CweCatalog.map.size >= 700)
  }

  test("ids above 200 resolve (models.py:552-582 parity)") {
    assert(CweCatalog.map(918) == "Server-Side Request Forgery (SSRF)")
    assert(CweCatalog.map(306)
      == "Missing Authentication for Critical Function")
    assert(CweCatalog.map(601)
      == "URL Redirection to Untrusted Site ('Open Redirect')")
    assert(CweCatalog.map(1336)
      == "Improper Neutralization of Special Elements Used in a Template Engine")
  }

  test("well-known ids resolve to canonical MITRE names") {
    assert(CweCatalog.map(79)
      == "Improper Neutralization of Input During Web Page Generation ('Cross-site Scripting')")
    assert(CweCatalog.map(89)
      == "Improper Neutralization of Special Elements used in an SQL Command ('SQL Injection')")
    assert(CweCatalog.map(119)
      == "Improper Restriction of Operations within the Bounds of a Memory Buffer")
    assert(CweCatalog.map(416) == "Use After Free")
    assert(CweCatalog.map(787) == "Out-of-bounds Write")
  }

  test("ids are unique and names non-empty") {
    assert(CweCatalog.map.values.forall(_.nonEmpty))
    // map construction would have collapsed duplicates silently; re-read
    // the resource to prove the file itself has no duplicate ids.
    val in = getClass.getResourceAsStream("/graft/cwe_catalog.tsv")
    val ids =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map(_.takeWhile(_ != '\t').toInt).toList
      finally in.close()
    assert(ids.distinct.size == ids.size)
    assert(ids.size == CweCatalog.map.size)
  }
}
