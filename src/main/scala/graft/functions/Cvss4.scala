package graft.functions

/** CVSS v4.0 base-score computation (CVSS-B) from vector strings.
  *
  * Implements the public FIRST CVSS v4.0 specification's MacroVector
  * scoring: the vector is classified into six equivalence-class digits
  * (EQ1..EQ6), the published 270-entry lookup table gives the class
  * score, and the final score interpolates toward the next-lower class
  * proportionally to the vector's severity distance from the highest
  * severity vector of its class. Re-expresses the scoring the reference
  * delegates to the `cvss` library (severity_systems.py:94-110);
  * validated bit-exact against the published scores in the reference's
  * fixtures (suse-cvss-scores-expected.json, ubuntu/github OSV expected
  * files) and the spec docstring example.
  *
  * Base-only semantics: E defaults to Attacked, CR/IR/AR default to High,
  * environmental (M*) metrics override their base metric when present.
  */
object Cvss4 {

  /** The published macrovector score table (FIRST CVSS v4.0, key =
    * eq1 eq2 eq3 eq4 eq5 eq6 digits). */
  private val Lookup: Map[String, Double] = Map(
    "000000" -> 10.0, "000001" -> 9.9, "000010" -> 9.8, "000011" -> 9.5,
    "000020" -> 9.5, "000021" -> 9.2, "000100" -> 10.0, "000101" -> 9.6,
    "000110" -> 9.3, "000111" -> 8.7, "000120" -> 9.1, "000121" -> 8.1,
    "000200" -> 9.3, "000201" -> 9.0, "000210" -> 8.9, "000211" -> 8.0,
    "000220" -> 8.1, "000221" -> 6.8, "001000" -> 9.8, "001001" -> 9.5,
    "001010" -> 9.5, "001011" -> 9.2, "001020" -> 9.0, "001021" -> 8.4,
    "001100" -> 9.3, "001101" -> 9.2, "001110" -> 8.9, "001111" -> 8.1,
    "001120" -> 8.1, "001121" -> 6.5, "001200" -> 8.8, "001201" -> 8.0,
    "001210" -> 7.8, "001211" -> 7.0, "001220" -> 6.9, "001221" -> 4.8,
    "002001" -> 9.2, "002011" -> 8.2, "002021" -> 7.2, "002101" -> 7.9,
    "002111" -> 6.9, "002121" -> 5.0, "002201" -> 6.9, "002211" -> 5.5,
    "002221" -> 2.7, "010000" -> 9.9, "010001" -> 9.7, "010010" -> 9.5,
    "010011" -> 9.2, "010020" -> 9.2, "010021" -> 8.5, "010100" -> 9.5,
    "010101" -> 9.1, "010110" -> 9.0, "010111" -> 8.3, "010120" -> 8.4,
    "010121" -> 7.1, "010200" -> 9.2, "010201" -> 8.1, "010210" -> 8.2,
    "010211" -> 7.1, "010220" -> 7.2, "010221" -> 5.3, "011000" -> 9.5,
    "011001" -> 9.3, "011010" -> 9.2, "011011" -> 8.5, "011020" -> 8.5,
    "011021" -> 7.3, "011100" -> 9.2, "011101" -> 8.2, "011110" -> 8.0,
    "011111" -> 7.2, "011120" -> 7.0, "011121" -> 5.9, "011200" -> 8.4,
    "011201" -> 7.0, "011210" -> 7.1, "011211" -> 5.2, "011220" -> 5.0,
    "011221" -> 3.0, "012001" -> 8.6, "012011" -> 7.5, "012021" -> 5.2,
    "012101" -> 7.1, "012111" -> 5.2, "012121" -> 2.9, "012201" -> 6.3,
    "012211" -> 2.9, "012221" -> 1.7, "100000" -> 9.8, "100001" -> 9.5,
    "100010" -> 9.4, "100011" -> 8.7, "100020" -> 9.1, "100021" -> 8.1,
    "100100" -> 9.4, "100101" -> 8.9, "100110" -> 8.6, "100111" -> 7.4,
    "100120" -> 7.7, "100121" -> 6.4, "100200" -> 8.7, "100201" -> 7.5,
    "100210" -> 7.4, "100211" -> 6.3, "100220" -> 6.3, "100221" -> 4.9,
    "101000" -> 9.4, "101001" -> 8.9, "101010" -> 8.8, "101011" -> 7.7,
    "101020" -> 7.6, "101021" -> 6.7, "101100" -> 8.6, "101101" -> 7.6,
    "101110" -> 7.4, "101111" -> 5.8, "101120" -> 5.9, "101121" -> 5.0,
    "101200" -> 7.2, "101201" -> 5.7, "101210" -> 5.7, "101211" -> 5.2,
    "101220" -> 5.2, "101221" -> 2.5, "102001" -> 8.3, "102011" -> 7.0,
    "102021" -> 5.4, "102101" -> 6.5, "102111" -> 5.8, "102121" -> 2.6,
    "102201" -> 5.3, "102211" -> 2.1, "102221" -> 1.3, "110000" -> 9.5,
    "110001" -> 9.0, "110010" -> 8.8, "110011" -> 7.6, "110020" -> 7.6,
    "110021" -> 7.0, "110100" -> 9.0, "110101" -> 7.7, "110110" -> 7.5,
    "110111" -> 6.2, "110120" -> 6.1, "110121" -> 5.3, "110200" -> 7.7,
    "110201" -> 6.6, "110210" -> 6.8, "110211" -> 5.9, "110220" -> 5.2,
    "110221" -> 3.0, "111000" -> 8.9, "111001" -> 7.8, "111010" -> 7.6,
    "111011" -> 6.7, "111020" -> 6.2, "111021" -> 5.8, "111100" -> 7.4,
    "111101" -> 5.9, "111110" -> 5.7, "111111" -> 5.7, "111120" -> 4.7,
    "111121" -> 2.3, "111200" -> 6.1, "111201" -> 5.2, "111210" -> 5.7,
    "111211" -> 2.9, "111220" -> 2.4, "111221" -> 1.6, "112001" -> 7.1,
    "112011" -> 5.9, "112021" -> 3.0, "112101" -> 5.8, "112111" -> 2.6,
    "112121" -> 1.5, "112201" -> 2.3, "112211" -> 1.3, "112221" -> 0.6,
    "200000" -> 9.3, "200001" -> 8.7, "200010" -> 8.6, "200011" -> 7.2,
    "200020" -> 7.5, "200021" -> 5.8, "200100" -> 8.6, "200101" -> 7.4,
    "200110" -> 7.4, "200111" -> 6.1, "200120" -> 5.6, "200121" -> 3.4,
    "200200" -> 7.0, "200201" -> 5.4, "200210" -> 5.2, "200211" -> 4.0,
    "200220" -> 4.0, "200221" -> 2.2, "201000" -> 8.5, "201001" -> 7.5,
    "201010" -> 7.4, "201011" -> 5.5, "201020" -> 6.2, "201021" -> 5.1,
    "201100" -> 7.2, "201101" -> 5.7, "201110" -> 5.5, "201111" -> 4.1,
    "201120" -> 4.6, "201121" -> 1.9, "201200" -> 5.3, "201201" -> 3.6,
    "201210" -> 3.4, "201211" -> 1.9, "201220" -> 1.9, "201221" -> 0.8,
    "202001" -> 6.4, "202011" -> 5.1, "202021" -> 2.0, "202101" -> 4.7,
    "202111" -> 2.1, "202121" -> 1.1, "202201" -> 2.4, "202211" -> 0.9,
    "202221" -> 0.4, "210000" -> 8.8, "210001" -> 7.5, "210010" -> 7.3,
    "210011" -> 5.3, "210020" -> 6.0, "210021" -> 5.0, "210100" -> 7.3,
    "210101" -> 5.5, "210110" -> 5.9, "210111" -> 4.0, "210120" -> 4.1,
    "210121" -> 2.0, "210200" -> 5.4, "210201" -> 4.3, "210210" -> 4.5,
    "210211" -> 2.2, "210220" -> 2.0, "210221" -> 1.1, "211000" -> 7.5,
    "211001" -> 5.5, "211010" -> 5.8, "211011" -> 4.5, "211020" -> 4.0,
    "211021" -> 2.1, "211100" -> 6.1, "211101" -> 5.1, "211110" -> 4.8,
    "211111" -> 1.8, "211120" -> 2.0, "211121" -> 0.9, "211200" -> 4.6,
    "211201" -> 1.8, "211210" -> 1.7, "211211" -> 0.7, "211220" -> 0.8,
    "211221" -> 0.2, "212001" -> 5.3, "212011" -> 2.4, "212021" -> 1.4,
    "212101" -> 2.4, "212111" -> 1.2, "212121" -> 0.5, "212201" -> 1.0,
    "212211" -> 0.3, "212221" -> 0.1)

  /** Highest-severity vector fragments per EQ level (spec "maxComposed");
    * EQ3 and EQ6 are a joint class. */
  private val MaxEq1 = Map(
    0 -> Seq("AV:N/PR:N/UI:N/"),
    1 -> Seq("AV:A/PR:N/UI:N/", "AV:N/PR:L/UI:N/", "AV:N/PR:N/UI:P/"),
    2 -> Seq("AV:P/PR:N/UI:N/", "AV:A/PR:L/UI:P/"))
  private val MaxEq2 = Map(
    0 -> Seq("AC:L/AT:N/"),
    1 -> Seq("AC:H/AT:N/", "AC:L/AT:P/"))
  private val MaxEq3Eq6 = Map(
    (0, 0) -> Seq("VC:H/VI:H/VA:H/CR:H/IR:H/AR:H/"),
    (0, 1) -> Seq("VC:H/VI:H/VA:L/CR:M/IR:M/AR:H/",
      "VC:H/VI:H/VA:H/CR:M/IR:M/AR:M/"),
    (1, 0) -> Seq("VC:L/VI:H/VA:H/CR:H/IR:H/AR:H/",
      "VC:H/VI:L/VA:H/CR:H/IR:H/AR:H/"),
    (1, 1) -> Seq("VC:L/VI:H/VA:L/CR:H/IR:M/AR:H/",
      "VC:L/VI:H/VA:H/CR:H/IR:M/AR:M/",
      "VC:H/VI:L/VA:H/CR:M/IR:H/AR:M/",
      "VC:H/VI:L/VA:L/CR:M/IR:H/AR:H/",
      "VC:L/VI:L/VA:H/CR:H/IR:H/AR:M/"),
    (2, 1) -> Seq("VC:L/VI:L/VA:L/CR:H/IR:H/AR:H/"))
  private val MaxEq4 = Map(
    0 -> Seq("SC:H/SI:S/SA:S/"),
    1 -> Seq("SC:H/SI:H/SA:H/"),
    2 -> Seq("SC:L/SI:L/SA:L/"))
  private val MaxEq5 = Map(
    0 -> Seq("E:A/"), 1 -> Seq("E:P/"), 2 -> Seq("E:U/"))

  /** Severity depth of each EQ class (spec "maxSeverity", in 0.1 steps). */
  private val DepthEq1 = Map(0 -> 1, 1 -> 4, 2 -> 5)
  private val DepthEq2 = Map(0 -> 1, 1 -> 2)
  private val DepthEq3Eq6 =
    Map((0, 0) -> 7, (0, 1) -> 6, (1, 0) -> 8, (1, 1) -> 8, (2, 1) -> 10)
  private val DepthEq4 = Map(0 -> 6, 1 -> 5, 2 -> 4)

  /** Metric value → severity index (0 = most severe), in 0.1-step units. */
  private val Levels: Map[String, Map[String, Int]] = Map(
    "AV" -> Map("N" -> 0, "A" -> 1, "L" -> 2, "P" -> 3),
    "PR" -> Map("N" -> 0, "L" -> 1, "H" -> 2),
    "UI" -> Map("N" -> 0, "P" -> 1, "A" -> 2),
    "AC" -> Map("L" -> 0, "H" -> 1),
    "AT" -> Map("N" -> 0, "P" -> 1),
    "VC" -> Map("H" -> 0, "L" -> 1, "N" -> 2),
    "VI" -> Map("H" -> 0, "L" -> 1, "N" -> 2),
    "VA" -> Map("H" -> 0, "L" -> 1, "N" -> 2),
    "SC" -> Map("H" -> 1, "L" -> 2, "N" -> 3),
    "SI" -> Map("S" -> 0, "H" -> 1, "L" -> 2, "N" -> 3),
    "SA" -> Map("S" -> 0, "H" -> 1, "L" -> 2, "N" -> 3),
    "CR" -> Map("H" -> 0, "M" -> 1, "L" -> 2),
    "IR" -> Map("H" -> 0, "M" -> 1, "L" -> 2),
    "AR" -> Map("H" -> 0, "M" -> 1, "L" -> 2),
    "E" -> Map("A" -> 0, "P" -> 1, "U" -> 2))

  private val DistanceMetrics = Seq("AV", "PR", "UI", "AC", "AT",
    "VC", "VI", "VA", "SC", "SI", "SA", "CR", "IR", "AR")

  private def parse(vector: String): Map[String, String] =
    vector.trim.split('/').toSeq.filter(_.contains(':')).map { p =>
      val i = p.indexOf(':')
      p.substring(0, i) -> p.substring(i + 1)
    }.toMap

  /** Effective metric value: modified (M*) overrides base; E/CR/IR/AR get
    * their base-scoring defaults when not defined. */
  private def eff(m: Map[String, String], k: String): String = {
    val modified = m.getOrElse("M" + k, "X")
    if (modified != "X") modified
    else {
      val base = m.getOrElse(k, "X")
      if (base != "X") base
      else k match {
        case "E" => "A"
        case "CR" | "IR" | "AR" => "H"
        case _ => "X"
      }
    }
  }

  private def macroVector(m: Map[String, String]): (Int, Int, Int, Int, Int, Int) = {
    val (av, pr, ui) = (eff(m, "AV"), eff(m, "PR"), eff(m, "UI"))
    val (ac, at) = (eff(m, "AC"), eff(m, "AT"))
    val (vc, vi, va) = (eff(m, "VC"), eff(m, "VI"), eff(m, "VA"))
    val (sc, si, sa) = (eff(m, "SC"), eff(m, "SI"), eff(m, "SA"))
    val (cr, ir, ar) = (eff(m, "CR"), eff(m, "IR"), eff(m, "AR"))
    val eq1 =
      if (av == "N" && pr == "N" && ui == "N") 0
      else if ((av == "N" || pr == "N" || ui == "N") && av != "P") 1
      else 2
    val eq2 = if (ac == "L" && at == "N") 0 else 1
    val eq3 =
      if (vc == "H" && vi == "H") 0
      else if (vc == "H" || vi == "H" || va == "H") 1
      else 2
    val eq4 =
      if (si == "S" || sa == "S") 0
      else if (sc == "H" || si == "H" || sa == "H") 1
      else 2
    val eq5 = eff(m, "E") match { case "A" => 0; case "P" => 1; case _ => 2 }
    val eq6 =
      if ((cr == "H" && vc == "H") || (ir == "H" && vi == "H") ||
        (ar == "H" && va == "H")) 0
      else 1
    (eq1, eq2, eq3, eq4, eq5, eq6)
  }

  /** CVSS v4.0 base score; None on malformed/incomplete vectors. */
  def baseScore(vector: String): Option[Double] = {
    try {
      val m = parse(vector)
      if (Seq("VC", "VI", "VA", "SC", "SI", "SA").forall(eff(m, _) == "N"))
        return Some(0.0)
      val (eq1, eq2, eq3, eq4, eq5, eq6) = macroVector(m)
      def lk(t: (Int, Int, Int, Int, Int, Int)): Option[Double] =
        Lookup.get(s"${t._1}${t._2}${t._3}${t._4}${t._5}${t._6}")
      val value = lk((eq1, eq2, eq3, eq4, eq5, eq6)).get

      val nextEq1 = lk((eq1 + 1, eq2, eq3, eq4, eq5, eq6))
      val nextEq2 = lk((eq1, eq2 + 1, eq3, eq4, eq5, eq6))
      val nextEq4 = lk((eq1, eq2, eq3, eq4 + 1, eq5, eq6))
      val nextEq5 = lk((eq1, eq2, eq3, eq4, eq5 + 1, eq6))
      // EQ3/EQ6 are a joint class; from (0,0) both descents exist and the
      // higher-scoring one is used (per the spec's reference code).
      val nextEq3Eq6 = (eq3, eq6) match {
        case (1, 1) | (0, 1) => lk((eq1, eq2, eq3 + 1, eq4, eq5, eq6))
        case (1, 0)          => lk((eq1, eq2, eq3, eq4, eq5, eq6 + 1))
        case (0, 0) =>
          val l = lk((eq1, eq2, eq3, eq4, eq5, eq6 + 1))
          val r = lk((eq1, eq2, eq3 + 1, eq4, eq5, eq6))
          (l.toSeq ++ r.toSeq).reduceOption((a: Double, b: Double) => math.max(a, b))
        case _ => None
      }

      // severity distance of this vector from the highest-severity vector
      // of its macrovector class (the first candidate with all per-metric
      // distances non-negative)
      val candidates = for {
        c1 <- MaxEq1(eq1)
        c2 <- MaxEq2(eq2)
        c36 <- MaxEq3Eq6((eq3, eq6))
        c4 <- MaxEq4(eq4)
        c5 <- MaxEq5(eq5)
      } yield parse(c1 + c2 + c36 + c4 + c5)
      val dists = candidates.iterator.map { mx =>
        DistanceMetrics.map(k => k -> (Levels(k)(eff(m, k)) - Levels(k)(mx(k))))
          .toMap
      }.find(_.values.forall(_ >= 0)).get

      val dEq1 = dists("AV") + dists("PR") + dists("UI")
      val dEq2 = dists("AC") + dists("AT")
      val dEq3Eq6 = dists("VC") + dists("VI") + dists("VA") +
        dists("CR") + dists("IR") + dists("AR")
      val dEq4 = dists("SC") + dists("SI") + dists("SA")

      val parts = Seq(
        nextEq1.map(s => (value - s) * dEq1.toDouble / DepthEq1(eq1)),
        nextEq2.map(s => (value - s) * dEq2.toDouble / DepthEq2(eq2)),
        nextEq3Eq6.map(s => (value - s) * dEq3Eq6.toDouble / DepthEq3Eq6((eq3, eq6))),
        nextEq4.map(s => (value - s) * dEq4.toDouble / DepthEq4(eq4)),
        nextEq5.map(s => (value - s) * 0.0)).flatten
      val mean = if (parts.isEmpty) 0.0 else parts.sum / parts.size
      val v = math.max(0.0, math.min(10.0, value - mean))
      Some(math.round(v * 10.0).toDouble / 10.0)
    } catch { case _: Exception => None }
  }
}
