package graft.functions

/** Risk-score stack: weighted severity → exploitability → risk.
  *
  * Re-expresses vulnerabilities/risk.py:
  *   - textual severity → numeric map (risk.py:30-38), any OTHER
  *     non-empty textual value scoring 0 (risk.py:56 `score_map.get(v, 0)`)
  *     while an empty value is skipped outright (risk.py:49-50);
  *   - weighted severity = max(score × source-weight / 10) over severities
  *     that carry a URL — a severity with no URL is skipped entirely
  *     (risk.py:42-43) — weight looked up by reference-URL domain in the
  *     ~2,900-entry [[SeverityWeights]] table (weight_config.py, default 5
  *     per risk.py:18); 0.0, not absent, when nothing contributes
  *     (risk.py:60 `max_score = ... if score_list else 0`);
  *   - exploitability level: 2 if exploit known, 2 if any EPSS > 0.8,
  *     1 if any EXPLOIT-type reference, else 0.5 (risk.py:64-92);
  *   - risk = min(weighted_severity × exploitability, 10), 1 decimal,
  *     HALF_UP — but only when BOTH factors are truthy: a 0/None weighted
  *     severity leaves risk unset (pipes/risk_score.py:114-116,
  *     models.py:313-315).
  */
object Risk {

  val DefaultWeight = 5

  /** textual severity values → numeric score (risk.py:30-38). */
  val textualScores: Map[String, Double] = Map(
    "low" -> 3.0, "moderate" -> 6.9, "medium" -> 6.9,
    "high" -> 8.9, "important" -> 8.9,
    "critical" -> 10.0, "urgent" -> 10.0)

  /** Parse a severity `value` column: float if parseable else textual
    * map, with unknown non-empty textuals scoring 0 (risk.py:56) and
    * empty/null values skipped (risk.py:49-50 `if not vul_score`). */
  def parseScore(value: String): Option[Double] = {
    val v = Option(value).getOrElse("").trim.toLowerCase
    if (v.isEmpty) None
    else Some(v.toDoubleOption.getOrElse(textualScores.getOrElse(v, 0.0)))
  }

  /** Domain extraction for weight lookup (risk.py:42-46): netloc of the
    * reference URL, `www.` stripped. */
  def urlDomain(url: String): String = {
    val u = Option(url).getOrElse("").trim
    val noScheme = u.indexOf("://") match {
      case -1 => u
      case i  => u.substring(i + 3)
    }
    // lowercase BEFORE stripping: "WWW.Example.com" must reach the
    // weight table as "example.com", not keep its prefix because the
    // case-sensitive strip missed it
    noScheme.takeWhile(c => c != '/' && c != '?' && c != '#')
      .toLowerCase.stripPrefix("www.")
  }

  /** Weighted severity over (value, url) severity rows: max(score × w/10)
    * across URL-carrying severities, rounded HALF_UP to 1 decimal; 0.0
    * when nothing contributes (risk.py:21-61 — no-URL rows are skipped,
    * and the empty max is 0, not absent). Weights default to the bundled
    * weight_config table ([[SeverityWeights]]). */
  def weightedSeverity(
      severities: Seq[(String, String)],
      weights: Map[String, Int] = SeverityWeights.map): Double = {
    val ws = severities.flatMap { case (value, url) =>
      if (Option(url).getOrElse("").isEmpty) None
      else parseScore(value).map { score =>
        val w = weights.getOrElse(urlDomain(url), DefaultWeight)
        score * w / 10.0
      }
    }
    if (ws.isEmpty) 0.0 else round1(ws.max)
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

  /** risk = min(ws × e, 10) rounded HALF_UP to 1 decimal — None unless
    * both factors are truthy (pipes/risk_score.py:114-116: a 0 weighted
    * severity leaves the advisory's risk unset, not 0.0). */
  def riskScore(weightedSeverity: Double,
      exploitability: Double): Option[Double] =
    if (weightedSeverity > 0 && exploitability > 0)
      Some(round1(math.min(weightedSeverity * exploitability, 10.0)))
    else None

  /** Decimal HALF_UP quantize to 1 decimal (pipes/risk_score.py:19-26). */
  def round1(x: Double): Double =
    BigDecimal.valueOf(x).setScale(1, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
}
