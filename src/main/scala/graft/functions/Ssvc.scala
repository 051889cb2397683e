package graft.functions

/** SSVC (Stakeholder-Specific Vulnerability Categorization) vector +
  * decision computation (SURVEY F13; reference utils.py:752-863).
  *
  * Implements the public CISA SSVC coordinator decision tree subset the
  * reference uses: (Exploitation, Automatable, Technical Impact) +
  * Mission & Well-being → decision {Track, Track*, Attend, Act}.
  */
object Ssvc {

  /** Canonical vector string, e.g.
    * "SSVCv2/E:A/A:Y/T:T/M:H/D:A/" (fields in fixed order). */
  def vector(exploitation: String, automatable: String,
      technicalImpact: String, missionWellbeing: String): String = {
    val e = exploitation.toLowerCase match {
      case "active" => "A"; case "poc" => "P"; case _ => "N"
    }
    val a = if (automatable.equalsIgnoreCase("yes")) "Y" else "N"
    val t = if (technicalImpact.equalsIgnoreCase("total")) "T" else "P"
    val m = missionWellbeing.toLowerCase match {
      case "high" => "H"; case "medium" => "M"; case _ => "L"
    }
    val d = decision(exploitation, automatable, technicalImpact,
      missionWellbeing) match {
      // letter convention per collect_ssvc_trees.py REVERSE_DECISION:
      // T=Track, R=Track*, A=Attend, C=Act
      case "Act" => "C"; case "Attend" => "A"; case "Track*" => "R"
      case _ => "T"
    }
    s"SSVCv2/E:$e/A:$a/T:$t/M:$m/D:$d/"
  }

  /** Metric letter → (name, value-expansion) maps
    * (collect_ssvc_trees.py:171-186 REVERSE_POINTS / REVERSE_DECISION). */
  private val ReversePoints: Map[String, (String, Map[String, String])] = Map(
    "E" -> ("Exploitation", Map("N" -> "none", "P" -> "poc", "A" -> "active")),
    "A" -> ("Automatable", Map("N" -> "no", "Y" -> "yes")),
    "T" -> ("Technical Impact", Map("P" -> "partial", "T" -> "total")),
    "P" -> ("Mission Prevalence",
      Map("M" -> "minimal", "S" -> "support", "E" -> "essential")),
    "B" -> ("Public Well-being Impact",
      Map("M" -> "minimal", "A" -> "material", "I" -> "irreversible")),
    "M" -> ("Mission & Well-being",
      Map("L" -> "low", "M" -> "medium", "H" -> "high")))

  private val ReverseDecision: Map[String, String] =
    Map("T" -> "Track", "R" -> "Track*", "A" -> "Attend", "C" -> "Act")

  /** Parse an SSVCv2 vector into its expanded option list (vector order
    * preserved) and decision; None when the vector is malformed or carries
    * no decodable decision (collect_ssvc_trees.py:191-231). */
  def parseVector(vector: String): Option[(Seq[(String, String)], String)] = {
    val v = Option(vector).getOrElse("").trim
    if (!v.startsWith("SSVCv2/")) return None
    val parts = v.stripPrefix("SSVCv2/").split('/').filter(_.contains(':'))
    var decision: Option[String] = None
    val options = Seq.newBuilder[(String, String)]
    parts.foreach { p =>
      val i = p.indexOf(':')
      val (k, value) = (p.substring(0, i), p.substring(i + 1))
      if (k == "D") decision = ReverseDecision.get(value)
      else ReversePoints.get(k).foreach { case (name, mapping) =>
        mapping.get(value).foreach(x => options += (name -> x))
      }
    }
    val opts = options.result()
    decision.filter(_ => opts.nonEmpty).map(d => (opts, d))
  }

  /** Coordinator decision table (CISA SSVC guide). */
  def decision(exploitation: String, automatable: String,
      technicalImpact: String, missionWellbeing: String): String = {
    val e = exploitation.toLowerCase
    val a = automatable.equalsIgnoreCase("yes")
    val t = technicalImpact.equalsIgnoreCase("total")
    val m = missionWellbeing.toLowerCase
    (e, a, t, m) match {
      // active exploitation
      case ("active", true, _, "high")      => "Act"
      case ("active", true, true, "medium") => "Act"
      case ("active", true, _, _)           => "Attend"
      case ("active", false, true, "high")  => "Act"
      case ("active", false, _, "high")     => "Attend"
      case ("active", false, true, "medium") => "Attend"
      case ("active", false, _, _)          => "Track*"
      // poc
      case ("poc", true, _, "high")         => "Attend"
      case ("poc", true, true, "medium")    => "Track*"
      case ("poc", true, _, _)              => "Track"
      case ("poc", false, true, "high")     => "Attend"
      case ("poc", false, _, "high")        => "Track*"
      case ("poc", false, true, "medium")   => "Track*"
      case ("poc", false, _, _)             => "Track"
      // none
      case (_, true, _, "high")             => "Attend"
      case (_, true, true, "medium")        => "Track*"
      case (_, true, _, _)                  => "Track"
      case (_, false, true, "high")         => "Track*"
      case (_, false, _, _)                 => "Track"
    }
  }
}
