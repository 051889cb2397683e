package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generative properties of the version sort keys — the invariants the
  * whole rank family (versionRank, nearest-fix, s21's
  * latest_non_vulnerable pick) rests on. `compare` is DEFINED via
  * sortKey, so the tests target the semantics of the keys themselves:
  *
  *  1. numeric segments order numerically at every magnitude — the
  *     lexicographic-order bug class the round-11 s21 finding was
  *     ("1.9" > "1.10" under plain string sort);
  *  2. keys are pure ASCII for arbitrary printable inputs, so Spark's
  *     UTF8 binary comparisons and Java's String.compareTo agree — the
  *     cross-engine assumption every oracle mirror of the key relies on;
  *  3. semver prereleases sort before their release and deb `~`
  *     components sort before the empty suffix (univers/spec rules);
  *  4. a higher deb/rpm epoch dominates any version body.
  */
class VersionOrdPropSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  private val seg = Gen.chooseNum(0L, 9999999L)
  private val schemes = Seq("semver", "pypi", "deb", "rpm", "maven",
    "alpine", "alpm", "gem", "nuget", "generic", "openssl", "apache")

  test("numeric segments order numerically at every magnitude") {
    check(Prop.forAll(Gen.oneOf(schemes), seg, seg, seg, seg) {
      (scheme, a1, a2, b1, b2) =>
        val va = s"$a1.$a2"
        val vb = s"$b1.$b2"
        val expected = Ordering.Tuple2[Long, Long].compare((a1, a2), (b1, b2))
        val got = VersionOrd.compare(scheme, va, vb)
        math.signum(got) == math.signum(expected)
    })
  }

  test("UTF-8 and UTF-16 orderings of sort keys agree for any input") {
    // the cross-engine/driver-side assumption: Spark compares keys in
    // UTF-8 byte order, driver-local fast paths in Java UTF-16
    // code-unit order — they disagree only when a key leaves the BMP,
    // so no input (including supplementary-plane junk) may produce a
    // key containing surrogates
    val junk = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('.', '-', '+', '~', '_', ':'),
      1 -> Gen.oneOf('\u00e9', '\u03a9', '\u4e2d', '\ufffd', ' '),
      1 -> Gen.oneOf('\ud83d', '\ude00'))).map(_.mkString.take(30))
    def utf8Cmp(a: String, b: String) = java.util.Arrays.compareUnsigned(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    check(Prop.forAll(Gen.oneOf(schemes), junk, junk) { (scheme, va, vb) =>
      val (ka, kb) = (VersionOrd.sortKey(scheme, va),
        VersionOrd.sortKey(scheme, vb))
      ka.forall(!Character.isSurrogate(_)) &&
        math.signum(utf8Cmp(ka, kb).toLong) ==
          math.signum(ka.compareTo(kb).toLong)
    })
  }

  test("semver prerelease sorts before its release; deb ~ before empty") {
    val pre = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(10))
    check(Prop.forAll(seg, seg, seg, pre) { (a, b, c, p) =>
      val rel = s"$a.$b.$c"
      VersionOrd.compare("semver", s"$rel-$p", rel) < 0 &&
        VersionOrd.compare("deb", s"$rel~$p", rel) < 0
    })
  }

  test("apache: 4th-segment build metadata sort-ties the base but splits eqKey") {
    // univers ApacheVersion = semantic_version.Version.coerce: the 4th
    // dotted numeric becomes build metadata — IGNORED by precedence
    // (sortKey ties), INCLUDED by __eq__ (eqKey differs); and the
    // dotted spelling equals the explicit `+` spelling in both.
    check(Prop.forAll(seg, seg, seg, Gen.chooseNum(1L, 9999L)) {
      (a, b, c, d) =>
        val base = s"$a.$b.$c"
        VersionOrd.compare("apache", s"$base.$d", base) == 0 &&
          VersionOrd.eqKey("apache", s"$base.$d") !=
            VersionOrd.eqKey("apache", base) &&
          VersionOrd.eqKey("apache", s"$base.$d") ==
            VersionOrd.eqKey("apache", s"$base+$d") &&
          VersionOrd.compare("apache", s"$base-rc.1", base) < 0
    })
  }

  test("eqKey refines sortKey: eqKey-equal implies sortKey-equal, and " +
      "eqKey is the identity off eq-sensitive schemes") {
    // The algebraic contract the =/!= membership passes rest on: eqKey
    // partitions each sortKey tie class (never merges across classes),
    // so `=`-pins are always at least as selective as key-bound
    // intervals; and for every non-eqSensitive scheme the two keys are
    // THE SAME string, so the split cannot drift in silently.
    val junk = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('.', '-', '+', '~', '_', ':'),
      1 -> Gen.numChar)).map(_.mkString.take(24))
    check(Prop.forAll(Gen.oneOf(schemes), junk, junk) { (scheme, va, vb) =>
      val refines =
        VersionOrd.eqKey(scheme, va) != VersionOrd.eqKey(scheme, vb) ||
          VersionOrd.sortKey(scheme, va) == VersionOrd.sortKey(scheme, vb)
      val identityOffApache = VersionOrd.eqSensitive(scheme) ||
        (VersionOrd.eqKey(scheme, va) == VersionOrd.sortKey(scheme, va) &&
          VersionOrd.eqKey(scheme, vb) == VersionOrd.sortKey(scheme, vb))
      refines && identityOffApache
    })
  }

  test("apache membership algebra: =/!= evaluate on eqKey, bounds on " +
      "sortKey, for arbitrary build twins") {
    check(Prop.forAll(seg, seg, seg,
        Gen.chooseNum(1L, 9999L), Gen.chooseNum(1L, 9999L)) {
      (a, b, c, d, e) =>
        val base = s"$a.$b.$c"
        val vd = s"$base.$d" // build twin: sort-ties base, eq-differs
        val ve = s"$base.$e"
        // bounds see the sortKey tie: any build twin satisfies the
        // inclusive bounds of its base and fails the strict ones
        Vers.versionInRange(vd, s"vers:apache/<=$base") &&
          Vers.versionInRange(vd, s"vers:apache/>=$base") &&
          !Vers.versionInRange(vd, s"vers:apache/<$base") &&
          !Vers.versionInRange(vd, s"vers:apache/>$base") &&
          // `=` pins see eqKey: only the identical build satisfies
          Vers.versionInRange(vd, s"vers:apache/=$vd") &&
          Vers.versionInRange(vd, s"vers:apache/=$base+$d") &&
          (Vers.versionInRange(vd, s"vers:apache/=$ve") == (d == e)) &&
          !Vers.versionInRange(base, s"vers:apache/=$vd") &&
          !Vers.versionInRange(vd, s"vers:apache/=$base") &&
          // `!=` excludes exactly the eqKey-equal spelling: the build
          // twin passes through a !=base exclusion and vice versa
          Vers.versionInRange(vd, s"vers:apache/>=$base|!=$base") &&
          !Vers.versionInRange(vd, s"vers:apache/>=$base|!=$vd") &&
          Vers.versionInRange(base, s"vers:apache/>=$base|!=$vd")
    })
  }

  test("a higher deb/rpm epoch dominates any version body") {
    val body = Gen.nonEmptyListOf(seg).map(_.take(4).mkString("."))
    check(Prop.forAll(Gen.chooseNum(0, 98), body, body) { (e, va, vb) =>
      VersionOrd.compare("deb", s"$e:$va", s"${e + 1}:$vb") < 0 &&
        VersionOrd.compare("rpm", s"$e:$va", s"${e + 1}:$vb") < 0
    })
  }
}
