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
      case "Act" => "C"; case "Attend" => "A"; case "Track*" => "S"
      case _ => "T"
    }
    s"SSVCv2/E:$e/A:$a/T:$t/M:$m/D:$d/"
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
