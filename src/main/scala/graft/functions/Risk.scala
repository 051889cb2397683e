package graft.functions

/** Risk-score stack: weighted severity → exploitability → risk.
  *
  * Re-expresses vulnerabilities/risk.py:
  *   - textual severity → numeric map (risk.py:30-38);
  *   - weighted severity = max(score × source-weight / 10) over severities
  *     (risk.py:21-61), weight looked up by reference-URL domain
  *     (weight_config.py, default 5 per risk.py:18);
  *   - exploitability level: 2 if exploit known, 2 if any EPSS > 0.8,
  *     1 if any EXPLOIT-type reference, else 0.5 (risk.py:64-92);
  *   - risk = min(weighted_severity × exploitability, 10), 1 decimal,
  *     HALF_UP (models.py:305-315, pipes/risk_score.py:19-26).
  */
object Risk {

  val DefaultWeight = 5

  /** textual severity values → numeric score (risk.py:30-38). */
  val textualScores: Map[String, Double] = Map(
    "critical" -> 10.0, "high" -> 8.0, "important" -> 8.0,
    "moderate" -> 6.5, "medium" -> 6.5, "low" -> 3.0, "minor" -> 3.0,
    "none" -> 0.0, "negligible" -> 0.0, "unimportant" -> 0.0)

  /** Parse a severity `value` column: float if parseable else textual map. */
  def parseScore(value: String): Option[Double] = {
    val v = Option(value).getOrElse("").trim.toLowerCase
    if (v.isEmpty) None
    else v.toDoubleOption.orElse(textualScores.get(v))
  }

  /** Domain extraction for weight lookup (risk.py:42-46): netloc of the
    * reference URL, `www.` stripped. */
  def urlDomain(url: String): String = {
    val u = Option(url).getOrElse("").trim
    val noScheme = u.indexOf("://") match {
      case -1 => u
      case i  => u.substring(i + 3)
    }
    noScheme.takeWhile(c => c != '/' && c != '?' && c != '#')
      .stripPrefix("www.").toLowerCase
  }

  /** Weighted severity over (value, url) severity rows: max(score × w/10),
    * rounded HALF_UP to 1 decimal. */
  def weightedSeverity(
      severities: Seq[(String, String)],
      weights: Map[String, Int] = Map.empty): Option[Double] = {
    val ws = severities.flatMap { case (value, url) =>
      parseScore(value).map { score =>
        val w = weights.getOrElse(urlDomain(url), DefaultWeight)
        score * w / 10.0
      }
    }
    if (ws.isEmpty) None else Some(round1(ws.max))
  }

  /** Exploitability level (risk.py:64-92). */
  def exploitability(
      hasExploit: Boolean,
      epssScores: Seq[Double],
      hasExploitReference: Boolean): Double =
    if (hasExploit) 2.0
    else if (epssScores.exists(_ > 0.8)) 2.0
    else if (hasExploitReference) 1.0
    else 0.5

  /** risk = min(ws × e, 10) rounded HALF_UP to 1 decimal. */
  def riskScore(weightedSeverity: Double, exploitability: Double): Double =
    round1(math.min(weightedSeverity * exploitability, 10.0))

  /** Decimal HALF_UP quantize to 1 decimal (pipes/risk_score.py:19-26). */
  def round1(x: Double): Double =
    BigDecimal.valueOf(x).setScale(1, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
}
