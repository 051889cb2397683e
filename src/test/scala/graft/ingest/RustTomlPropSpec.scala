package graft.ingest

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generative round-trip property for the RustSec TOML-subset parser
  * (RustIngest.parseToml): any document rendered from the subset's own
  * grammar — section headers, bare-ident or quoted keys, quoted-string /
  * array-of-string / bare-scalar values, arrays optionally split across
  * lines, comments and blanks interleaved — parses back to exactly the
  * structure it was rendered from. This is the invariant the legacy rust
  * importer rests on; the captured RUSTSEC fixtures pin the reference
  * semantics, this shakes the parser over the whole grammar. */
class RustTomlPropSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  private val bareIdent: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOf(Gen.frequency(8 -> Gen.alphaNumChar,
      1 -> Gen.const('_'), 1 -> Gen.const('-')))
  } yield (h :: t).mkString

  // quoted keys carry rust function paths — ':', '.', '<', '>' etc.
  private val quotedKey: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(6 -> Gen.alphaNumChar,
      1 -> Gen.const(':'), 1 -> Gen.const('.'), 1 -> Gen.const('_')))
      .map(_.mkString)

  // string values: anything printable except the quote itself —
  // INCLUDING brackets (rust function paths like `<[u8]>::method`
  // carry `]` inside quoted array elements)
  private val strValue: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '/', ':',
      '-', '#', '!', '(', ')', '>', '<', '[', ']'))).map(_.mkString)

  private val bareScalar: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0, 99999).map(_.toString),
    Gen.oneOf("true", "false"),
    for (y <- Gen.chooseNum(2000, 2029); m <- Gen.chooseNum(1, 12);
      d <- Gen.chooseNum(1, 28))
      yield f"$y%04d-$m%02d-$d%02d")

  private sealed trait V
  private case class S(s: String, quoted: Boolean) extends V
  private case class A(xs: List[String], multiline: Boolean) extends V

  private val value: Gen[V] = Gen.frequency(
    3 -> strValue.map(S(_, quoted = true)),
    2 -> bareScalar.map(S(_, quoted = false)),
    3 -> (for {
      xs <- Gen.listOf(strValue)
      ml <- Gen.oneOf(true, false)
    } yield A(xs, ml)))

  private val section: Gen[(String, List[(String, Boolean, V)])] = for {
    name <- Gen.oneOf(Gen.const("advisory"), Gen.const("versions"),
      bareIdent.map(s => s"affected.$s"), bareIdent)
    n <- Gen.chooseNum(0, 6)
    keys <- Gen.listOfN(n, for {
      quoted <- Gen.oneOf(true, false)
      k <- if (quoted) quotedKey else bareIdent
      v <- value
    } yield (k, quoted, v))
  } yield (name, keys.groupBy(_._1).values.map(_.head).toList)

  private def render(secs: List[(String, List[(String, Boolean, V)])])
      : String = {
    val sb = new StringBuilder
    for ((name, keys) <- secs) {
      sb.append(s"[$name]\n")
      for ((k, quoted, v) <- keys) {
        val kk = if (quoted) s""""$k"""" else k
        v match {
          case S(s, true) => sb.append(s"""$kk = "$s"""").append('\n')
          case S(s, false) => sb.append(s"$kk = $s\n")
          case A(xs, false) =>
            sb.append(s"$kk = [")
              .append(xs.map(x => s""""$x"""").mkString(", "))
              .append("]\n")
          case A(xs, true) =>
            sb.append(s"$kk = [\n")
            xs.foreach(x => sb.append(s"""    "$x",""").append('\n'))
            sb.append("]\n")
        }
      }
      sb.append("\n# a comment line\n\n")
    }
    sb.toString
  }

  private def expected(secs: List[(String, List[(String, Boolean, V)])])
      : Map[String, Map[String, Any]] =
    secs.groupBy(_._1).map { case (name, ss) =>
      // parser semantics: a re-opened [section] keeps accumulating; a
      // re-written key takes the LAST value. The generator never
      // repeats keys within a section, so last-wins across sections.
      name -> ss.flatMap(_._2).map {
        case (k, _, S(s, _)) => k -> s
        case (k, _, A(xs, _)) => k -> xs
      }.toMap
    }.filter(_._2.nonEmpty) // a keyless [section] never materializes

  test("TOML subset round-trips through parseToml") {
    check(Prop.forAll(Gen.listOf(section)) { secs =>
      val uniq = secs.groupBy(_._1).values.map(_.head).toList
      val doc = render(uniq)
      val got = RustIngest.parseToml(doc.linesIterator.toSeq)
      val want = expected(uniq)
      if (got != want) {
        println(s"DOC:\n$doc\nGOT: $got\nWANT: $want")
        false
      } else true
    })
  }

  test("front-matter fence extraction stops at the closing fence") {
    val md = Seq("```toml", "[advisory]", "id = \"X\"", "```",
      "# body heading", "body text with = signs").mkString("\n")
    val doc = RustIngest.parseToml(RustIngest.tomlLines(md))
    assert(doc == Map("advisory" -> Map("id" -> "X")))
  }
}
