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

  /** The full coordinator decision table, transcribed verbatim from the
    * public CISA SSVC guide (the same 36-entry lookup the reference embeds
    * in utils.py:815-852). An explicit table, not case heuristics: round 1
    * compressed it into patterns and got four cells wrong (Track* where
    * the guide says Track). */
  private val DecisionTable: Map[(String, String, String, String), String] = Map(
    ("none", "no", "partial", "low") -> "Track",
    ("none", "no", "partial", "medium") -> "Track",
    ("none", "no", "partial", "high") -> "Track",
    ("none", "no", "total", "low") -> "Track",
    ("none", "no", "total", "medium") -> "Track",
    ("none", "no", "total", "high") -> "Track*",
    ("none", "yes", "partial", "low") -> "Track",
    ("none", "yes", "partial", "medium") -> "Track",
    ("none", "yes", "partial", "high") -> "Attend",
    ("none", "yes", "total", "low") -> "Track",
    ("none", "yes", "total", "medium") -> "Track",
    ("none", "yes", "total", "high") -> "Attend",
    ("poc", "no", "partial", "low") -> "Track",
    ("poc", "no", "partial", "medium") -> "Track",
    ("poc", "no", "partial", "high") -> "Track*",
    ("poc", "no", "total", "low") -> "Track",
    ("poc", "no", "total", "medium") -> "Track*",
    ("poc", "no", "total", "high") -> "Attend",
    ("poc", "yes", "partial", "low") -> "Track",
    ("poc", "yes", "partial", "medium") -> "Track",
    ("poc", "yes", "partial", "high") -> "Attend",
    ("poc", "yes", "total", "low") -> "Track",
    ("poc", "yes", "total", "medium") -> "Track*",
    ("poc", "yes", "total", "high") -> "Attend",
    ("active", "no", "partial", "low") -> "Track",
    ("active", "no", "partial", "medium") -> "Track",
    ("active", "no", "partial", "high") -> "Attend",
    ("active", "no", "total", "low") -> "Track",
    ("active", "no", "total", "medium") -> "Attend",
    ("active", "no", "total", "high") -> "Act",
    ("active", "yes", "partial", "low") -> "Attend",
    ("active", "yes", "partial", "medium") -> "Attend",
    ("active", "yes", "partial", "high") -> "Act",
    ("active", "yes", "total", "low") -> "Attend",
    ("active", "yes", "total", "medium") -> "Act",
    ("active", "yes", "total", "high") -> "Act")

  /** Coordinator decision (CISA SSVC guide); "Track" for off-table input
    * normalizations (e.g. unknown exploitation text → none). */
  def decision(exploitation: String, automatable: String,
      technicalImpact: String, missionWellbeing: String): String = {
    val e = exploitation.toLowerCase match {
      case x @ ("active" | "poc") => x
      case _ => "none"
    }
    val a = if (automatable.equalsIgnoreCase("yes")) "yes" else "no"
    val t = if (technicalImpact.equalsIgnoreCase("total")) "total" else "partial"
    val m = missionWellbeing.toLowerCase match {
      case x @ ("high" | "medium") => x
      case _ => "low"
    }
    DecisionTable((e, a, t, m))
  }

  /** Mission Prevalence × Public Well-being Impact → Mission & Well-being
    * (utils.py:766-787, CISA guide table). */
  private val MissionWellBeing: Map[(String, String), String] = Map(
    ("minimal", "minimal") -> "low",
    ("minimal", "material") -> "medium",
    ("minimal", "irreversible") -> "high",
    ("support", "minimal") -> "medium",
    ("support", "material") -> "medium",
    ("support", "irreversible") -> "high",
    ("essential", "minimal") -> "high",
    ("essential", "material") -> "high",
    ("essential", "irreversible") -> "high")

  private val VectorLetter: Map[String, (String, Map[String, String])] =
    ReversePoints.map { case (letter, (name, m)) =>
      name -> (letter, m.map(_.swap))
    }

  /** ssvc_calculator (utils.py:752-863): an SSVC options list (named
    * decision values, e.g. from a vulnrichment "other/ssvc" metric) →
    * (vector string, decision). Missing Mission Prevalence defaults to
    * minimal, missing Public Well-being to material; Mission & Well-being
    * derives from the table; options render in input order followed by
    * the derived M and the D decision letter, then the timestamp. */
  def calculator(options: Seq[(String, String)],
      timestamp: Option[String] = None): Option[(String, String)] = {
    // Mirror the reference's Python-dict semantics exactly
    // (utils.py:760, 779-787): duplicate option names collapse with the
    // LAST value winning but the FIRST occurrence's position kept, and a
    // given Mission & Well-being is overwritten IN PLACE by the derived
    // value (not filtered-and-appended) so the rendered vector preserves
    // its original slot. LinkedHashMap update has exactly dict's
    // keep-position-update-value behavior.
    val dict = scala.collection.mutable.LinkedHashMap.empty[String, String]
    options.foreach { case (k, v) => dict(k) = v.toLowerCase }
    if (!dict.contains("Mission Prevalence"))
      dict("Mission Prevalence") = "minimal"
    if (!dict.contains("Public Well-being Impact"))
      dict("Public Well-being Impact") = "material"
    val mw = for {
      p <- dict.get("Mission Prevalence")
      b <- dict.get("Public Well-being Impact")
      m <- MissionWellBeing.get((p, b))
    } yield m
    mw.foreach(m => dict("Mission & Well-being") = m)
    val rendered = dict.toSeq.flatMap { case (name, value) =>
      VectorLetter.get(name).flatMap { case (letter, toLetter) =>
        toLetter.get(value).map(l => s"$letter:$l")
      }
    }
    if (rendered.isEmpty) return None
    val d = for {
      e <- dict.get("Exploitation")
      a <- dict.get("Automatable")
      t <- dict.get("Technical Impact")
      m <- mw
      dec <- DecisionTable.get((e, a, t, m))
    } yield dec
    d.map { dec =>
      val dLetter = Map("Track" -> "T", "Track*" -> "R", "Attend" -> "A",
        "Act" -> "C")(dec)
      val ts = timestamp.map(_ + "/").getOrElse("")
      (s"SSVCv2/${rendered.mkString("/")}/D:$dLetter/$ts", dec)
    }
  }
}
