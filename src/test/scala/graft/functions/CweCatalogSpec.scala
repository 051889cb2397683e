package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The bundled CWE weakness catalog (models.py:552-582 resolves ids via
  * the cwe2 package; here the public MITRE id→name data is a bundled
  * TSV dimension).
  */
class CweCatalogSpec extends AnyFunSuite {

  test("catalog loads and is usefully sized") {
    assert(CweCatalog.map.size >= 150)
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
