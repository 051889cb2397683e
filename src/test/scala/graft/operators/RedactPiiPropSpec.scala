package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the PII patterns (JVM-level, java.util.regex — the
  * same engine Spark's regexp_replace compiles to) plus one generated
  * Spark batch cross-checking Corpus.redactPii against a plain
  * Pattern.replaceAll reference implementation.
  */
class RedactPiiPropSpec extends AnyFunSuite with SparkTestSession {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val cleanText = Gen.listOfN(8, word).map(_.mkString(" "))
  private val email = for {
    l <- word; d <- word
  } yield s"$l@$d.example"
  private val ip = for {
    a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    c <- Gen.choose(0, 255); d <- Gen.choose(0, 255)
  } yield s"$a.$b.$c.$d"
  private val phone = Gen.choose(0, 9999).map(n => f"555-$n%04d")

  test("letters-only text never matches any PII pattern") {
    check(Prop.forAll(cleanText) { t =>
      !t.matches(s".*${Corpus.EmailRe}.*") &&
        !t.matches(s".*${Corpus.Ipv4Re}.*") &&
        !t.matches(s".*${Corpus.PhoneRe}.*")
    })
  }

  test("generated emails/IPs/phones each match their own pattern fully") {
    check(Prop.forAll(email, ip, phone) { (e, i, p) =>
      e.matches(Corpus.EmailRe) && i.matches(Corpus.Ipv4Re) &&
        p.matches(Corpus.PhoneRe)
    })
  }

  test("Spark redaction equals the java.util.regex reference on a batch") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(42)
    def pick[A](g: Gen[A]): A = g(Gen.Parameters.default,
      org.scalacheck.rng.Seed(rng.nextLong())).get
    val rows = (1L to 100L).map { i =>
      val parts = Seq.newBuilder[String]
      parts += pick(cleanText)
      if (i % 2 == 0) parts += pick(email)
      if (i % 3 == 0) parts += pick(ip)
      if (i % 5 == 0) parts += pick(phone)
      parts += pick(cleanText)
      (i, rng.shuffle(parts.result()).mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    val got = Corpus.redactPii(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    rows.foreach { case (id, text) =>
      val exp = text
        .replaceAll(Corpus.EmailRe, "<EMAIL>")
        .replaceAll(Corpus.Ipv4Re, "<IP>")
        .replaceAll(Corpus.PhoneRe, "<PHONE>")
      val (ne, ni, np, red) = got(id)
      assert(red == exp, s"doc $id")
      assert(ne == (if (id % 2 == 0) 1 else 0), s"doc $id emails")
      assert(ni == (if (id % 3 == 0) 1 else 0), s"doc $id ips")
      assert(np == (if (id % 5 == 0) 1 else 0), s"doc $id phones")
    }
  }
}
