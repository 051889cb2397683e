package graft.functions

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Data-driven truth tables (FIXTURES.md §4): the executable spec files
  * version_range_cases.jsonl / version_order_cases.jsonl, mirroring the
  * reference's nginx truth table and univers doctests. */
class TruthTableSpec extends AnyFunSuite {

  private def cases(file: String): Seq[Map[String, String]] =
    Files.readAllLines(Paths.get(s"src/test/resources/fixtures/$file"))
      .asScala.toSeq.filter(_.trim.nonEmpty).map { line =>
        // minimal flat-JSON parse (fixtures are flat string/number/bool)
        raw""""(\w+)"\s*:\s*(?:"([^"]*)"|(-?\d+|true|false))""".r
          .findAllMatchIn(line)
          .map(m => m.group(1) -> Option(m.group(2)).getOrElse(m.group(3)))
          .toMap
      }

  test("version_range_cases.jsonl") {
    val all = cases("version_range_cases.jsonl")
    assert(all.nonEmpty)
    all.foreach { c =>
      val got = Vers.versionInRange(c("version"), c("range"))
      assert(got == c("expect_in_range").toBoolean,
        s"${c("version")} in ${c("range")}: got $got")
    }
  }

  test("version_order_cases.jsonl") {
    val all = cases("version_order_cases.jsonl")
    assert(all.nonEmpty)
    all.foreach { c =>
      val got = Integer.signum(
        VersionOrd.compare(c("scheme"), c("a"), c("b")))
      assert(got == c("expect").toInt,
        s"[${c("scheme")}] cmp(${c("a")}, ${c("b")}): got $got")
    }
  }
}

/** Property tests: the sort-key encoding must be a total order consistent
  * with itself for every scheme (antisymmetry/transitivity come free from
  * string comparison — the properties pin reflexivity, round-trip
  * stability and agreement between compare and sortKey). */
class VersionOrderPropertiesSpec extends AnyFunSuite {

  private val schemeGen = Gen.oneOf("semver", "pypi", "deb", "rpm", "maven",
    "generic")
  private val numGen = Gen.choose(0, 30)
  private val versionGen: Gen[String] = for {
    a <- numGen; b <- numGen; c <- numGen
    suffix <- Gen.oneOf("", "", "", "-alpha", "-rc.1", "~rc1", ".post1",
      "-1", ".dev2")
  } yield s"$a.$b.$c$suffix"

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("compare is reflexive and sortKey is deterministic") {
    check(Prop.forAll(schemeGen, versionGen) { (s, v) =>
      VersionOrd.compare(s, v, v) == 0 &&
        VersionOrd.sortKey(s, v) == VersionOrd.sortKey(s, v)
    })
  }

  test("compare agrees with lexicographic sortKey order") {
    check(Prop.forAll(schemeGen, versionGen, versionGen) { (s, a, b) =>
      Integer.signum(VersionOrd.compare(s, a, b)) ==
        Integer.signum(VersionOrd.sortKey(s, a)
          .compareTo(VersionOrd.sortKey(s, b)))
    })
  }

  test("range membership respects ordering: v in [lo,hi) iff lo<=v<hi") {
    check(Prop.forAll(versionGen, versionGen, versionGen) { (lo, hi, v) =>
      (VersionOrd.compare("semver", lo, hi) >= 0) || {
        val spec = s"vers:semver/>=$lo|<$hi"
        val expected = VersionOrd.compare("semver", v, lo) >= 0 &&
          VersionOrd.compare("semver", v, hi) < 0
        Vers.versionInRange(v, spec) == expected
      }
    })
  }
}
