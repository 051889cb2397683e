package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.RefCapture
import graft.operators.SparkTestSession

/** The reference's captured package-sort golden
  * (tests/test_data/package_sort: 103 real purls over 15 ecosystems),
  * asserted by test_view.py TestPackageSortTestCase: packages parse,
  * rank per (type, namespace, name) group by the ecosystem's version
  * order (`Package.calculate_version_rank`, models.py:953-973 sorting
  * with `get_purl_version_class`, utils.py:603-609), then list in the
  * model Meta ordering `[type, namespace, name, version_rank, …]` and
  * re-serialize. One golden exercises the purl codec (parse, percent
  * decode/encode round-trip — `%40` scoped npm namespaces, `%2B` debian
  * revisions), the scheme dispatch, and eleven version-order
  * implementations (alpm epochs, semver prereleases, composer, conan,
  * debian `~`, gem letter/digit segments, golang `-lts` prereleases,
  * maven `.Final`, nuget alphanumeric prerelease ids, pypi two-digit
  * segments, rpm) at once.
  *
  * Tie semantics: for byte-identical versions in one group the
  * reference's iterative rank interpolation degenerates to REVERSE
  * insertion order — each newly-created row (rank 0) leads the
  * rank-ordered queryset, Python's stable sort keeps it first among
  * equals, so it takes rank 1 and pushes earlier rows up (the golden's
  * `rpm/redhat/openssl?arch=…` block lists exactly the reversed input
  * order). The engine reproduces that as a descending-input-index
  * tiebreak in the rank window.
  */
class CapturedSortSpec extends AnyFunSuite with SparkTestSession {

  test("captured package-sort golden: 103 purls rank and order") {
    assume(RefCapture.available, "reference test_data checkout not present")
    val input = RefCapture.text("package_sort/input_purls.txt")
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val expected = RefCapture.text("package_sort/sorted_purls.txt")
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    assert(input.length == 103 && expected.length == 103)

    // the reference maps generic/github/conan through univers'
    // RANGE_CLASS_BY_SCHEMES to SemverVersion/ConanVersion; the engine's
    // versionScheme sends them to the generic key — equivalent on every
    // captured version (plain dotted numerics), asserted by this golden
    val parsed = input.zipWithIndex.map { case (s, i) =>
      (i, PurlCodec.parse(s))
    }
    // every purl re-serializes to its input spelling (the inputs are
    // already canonical packageurl-python renderings)
    parsed.foreach { case (i, p) =>
      assert(p.format == input(i), s"re-serialize ${input(i)} -> ${p.format}")
    }

    val ordered = parsed
      .groupBy { case (_, p) => (p.ptype, p.namespace, p.name) }
      .toSeq
      .flatMap { case (_, group) =>
        val ranked = group.sortBy { case (i, p) =>
          (VersionOrd.sortKey(p.versionScheme, p.version), -i)
        }
        ranked.zipWithIndex.map { case ((i, p), rank) => (p, rank, i) }
      }
      .sortBy { case (p, rank, _) =>
        (p.ptype, p.namespace, p.name, rank)
      }
      .map { case (p, _, _) => p.format }

    assert(ordered.length == expected.length)
    ordered.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got == want, s"row $i: ours=$got ref=$want")
    }
  }
}
