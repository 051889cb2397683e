package graft.functions

/** CVSS base-score computation (v2, v3.0/v3.1, v4.0) from vector strings.
  *
  * Re-expresses severity_systems.py:48-131 (which delegates to the `cvss`
  * library); formulas implemented from the public FIRST specifications
  * (CVSS v2 guide §3.2.1, CVSS v3.1 spec §7.1, CVSS v4.0 MacroVector
  * scoring in [[Cvss4]]).
  */
object Cvss {

  private def roundUp1(x: Double): Double = math.ceil(x * 10.0) / 10.0

  /** CVSS v3.x base score from an AV:../AC:../PR:../UI:../S:../C:../I:../A:..
    * vector (with or without the CVSS:3.x/ prefix). Returns None on
    * malformed vectors. */
  def v3BaseScore(vector: String): Option[Double] = {
    val m = metrics(vector)
    try {
      val scopeChanged = m("S") == "C"
      val av = m("AV") match {
        case "N" => 0.85; case "A" => 0.62; case "L" => 0.55; case "P" => 0.2
      }
      val ac = m("AC") match { case "L" => 0.77; case "H" => 0.44 }
      val pr = (m("PR"), scopeChanged) match {
        case ("N", _)     => 0.85
        case ("L", false) => 0.62
        case ("L", true)  => 0.68
        case ("H", false) => 0.27
        case ("H", true)  => 0.5
      }
      val ui = m("UI") match { case "N" => 0.85; case "R" => 0.62 }
      def cia(k: String) = m(k) match {
        case "H" => 0.56; case "L" => 0.22; case "N" => 0.0
      }
      val iscBase = 1.0 - (1.0 - cia("C")) * (1.0 - cia("I")) * (1.0 - cia("A"))
      val impact =
        if (scopeChanged)
          7.52 * (iscBase - 0.029) - 3.25 * math.pow(iscBase - 0.02, 15)
        else 6.42 * iscBase
      val exploitability = 8.22 * av * ac * pr * ui
      val score =
        if (impact <= 0) 0.0
        else if (scopeChanged) roundUp1(math.min(1.08 * (impact + exploitability), 10.0))
        else roundUp1(math.min(impact + exploitability, 10.0))
      Some(score)
    } catch { case _: Exception => None }
  }

  /** CVSS v2 base score from an AV:../AC:../Au:../C:../I:../A:.. vector. */
  def v2BaseScore(vector: String): Option[Double] = {
    val m = metrics(vector)
    try {
      val av = m("AV") match { case "N" => 1.0; case "A" => 0.646; case "L" => 0.395 }
      val ac = m("AC") match { case "L" => 0.71; case "M" => 0.61; case "H" => 0.35 }
      val au = m("AU") match { case "N" => 0.704; case "S" => 0.56; case "M" => 0.45 }
      def cia(k: String) = m(k) match {
        case "C" => 0.660; case "P" => 0.275; case "N" => 0.0
      }
      val impact = 10.41 * (1 - (1 - cia("C")) * (1 - cia("I")) * (1 - cia("A")))
      val exploitability = 20 * av * ac * au
      val fImpact = if (impact == 0) 0.0 else 1.176
      val score = ((0.6 * impact) + (0.4 * exploitability) - 1.5) * fImpact
      Some(math.round(score * 10.0) / 10.0)
    } catch { case _: Exception => None }
  }

  /** Score a vector by sniffing its version. */
  /** Bounded vector → score memo (the Vers.parseCached pattern): CVSS
    * vector strings come from a finite grammar and real severity feeds
    * repeat them massively (the noop-mode bench measured ~25 µs per
    * v4 scoring — the macrovector candidate search — against a fixture
    * with 8 distinct vectors). Capped at 64k entries; past the cap
    * later arrivals compute per call. Some(null-free) Options only —
    * the map stores the Option itself. */
  private val scoreCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Double]]()

  def baseScore(vector: String): Option[Double] = {
    val v = vector.trim
    val hit = scoreCache.get(v)
    if (hit != null) return hit
    val r =
      if (v.startsWith("CVSS:3")) v3BaseScore(v)
      else if (v.startsWith("CVSS:4")) Cvss4.baseScore(v)
      else if (v.contains("Au:")) v2BaseScore(v)
      else v3BaseScore(v)
    if (scoreCache.size < 65536) scoreCache.putIfAbsent(v, r)
    r
  }

  /** Severity bucket per the public v3 ratings (also applied to v2 for the
    * reference's severity_range use, utils.py:512-545). */
  def rating(score: Double): String =
    if (score <= 0.0) "none"
    else if (score < 4.0) "low"
    else if (score < 7.0) "medium"
    else if (score < 9.0) "high"
    else "critical"

  /** Numeric-severity grammar shared by this scalar form, the column
    * twin `Serving.severityRangeCol`, and the a14 DuckDB oracle: the
    * Python float() literal grammar minus inf/nan (no severity source
    * emits those). One explicit rule so the two engine implementations
    * can never disagree on what counts as numeric. */
  val NumericScoreRe =
    "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  /** Severity-range string over mixed numeric/word values
    * (utils.py:512-545 get_severity_range): words map to their
    * [lo, hi] bucket (low / moderate / medium / high / important /
    * critical), numerics pass through, unknown words drop, and the
    * result is "min - max" — None when nothing parses. Rendered like
    * Python str(): floats keep the trailing .0, but the low bucket's
    * upper bound is the INT 3 in the reference score_map, so an
    * all-low maximum renders "3" (f-string int rendering). When a
    * NUMERIC 3.0 is also present the float spelling wins ("3.0") —
    * the reference's own output there depends on list order; this is
    * the deterministic reading. */
  def severityRange(values: Iterable[String]): Option[String] = {
    val scoreMap = Map(
      "low" -> Seq(0.1, 3.0), "moderate" -> Seq(4.0, 6.9),
      "medium" -> Seq(4.0, 6.9), "high" -> Seq(7.0, 8.9),
      "important" -> Seq(7.0, 8.9), "critical" -> Seq(9.0, 10.0))
    var lowUsed = false
    var numericThree = false
    val scores = values.toSeq.flatMap { v =>
      val t = v.trim
      // finite-only AND |d| < 1e16: the grammar admits overflow
      // spellings ("1e999") that Python parses to inf, but the three
      // renderers disagree there (Python "inf", Spark cast "Infinity",
      // DuckDB 'inf') — non-finite parses drop like unknown words in
      // ALL THREE twins. Same rule for finite large magnitudes
      // ("1e17"): above 1e16 py()/the Spark cast stop matching Python
      // str(float) ("1.0E17" vs "1e+17"), so the shared domain clamps
      // there too — the two documented divergences from float()
      if (t.matches(NumericScoreRe) && !t.toDouble.isInfinity &&
          math.abs(t.toDouble) < 1e16) {
        // "+ 0.0" folds negative zero to +0.0 in ALL THREE twins: the
        // reference's own ±0.0 output is list-order-dependent (Python
        // min/max return the first of equal elements) and Spark's
        // array_min/Scala's Double.compare disagree on the sign, so
        // the deterministic reading is the unsigned zero
        val d = t.toDouble + 0.0
        if (d == 3.0) numericThree = true
        Seq(d)
      } else {
        val key = t.toLowerCase
        if (key == "low") lowUsed = true
        scoreMap.getOrElse(key, Seq.empty)
      }
    }
    if (scores.isEmpty) None
    else {
      // str(float) parity; negative zero cannot reach here (folded to
      // +0.0 at parse, see above)
      def py(d: Double): String =
        if (d == d.floor && math.abs(d) < 1e16) s"${d.toLong}.0"
        else d.toString
      val mx = scores.max
      val maxStr =
        if (mx == 3.0 && lowUsed && !numericThree) "3" else py(mx)
      Some(s"${py(scores.min)} - $maxStr")
    }
  }

  private def metrics(vector: String): Map[String, String] =
    vector.trim.split('/').toSeq
      .filter(_.contains(':'))
      .map { p =>
        val i = p.indexOf(':')
        p.substring(0, i).toUpperCase -> p.substring(i + 1).toUpperCase
      }.toMap
}
