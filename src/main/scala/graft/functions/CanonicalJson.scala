package graft.functions

import java.security.MessageDigest

/** Canonical content identity — sha256 over a canonical JSON form.
  *
  * Re-expresses utils.py:623-691 (`canonical_value`, `compute_content_id`):
  * dict keys sorted, compact separators, lists normalized (falsy dropped,
  * sorted by their canonical form), strings whitespace-stripped; the hash
  * is the hex sha256 of the UTF-8 canonical text. Used for advisory dedup
  * identity (D1) and group pre-bucketing (D3).
  */
object CanonicalJson {

  /** Canonical JSON text for a tree of Map/Seq/String/Number/Boolean/null. */
  def canonical(value: Any): String = value match {
    case null                 => "null"
    case None                 => "null"
    case Some(v)              => canonical(v)
    case s: String            => quote(s.trim)
    case b: Boolean           => b.toString
    case i: Int               => i.toString
    case l: Long              => l.toString
    case d: Double            => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case bd: BigDecimal       => bd.bigDecimal.stripTrailingZeros.toPlainString
    case m: collection.Map[_, _] =>
      m.toSeq.map { case (k, v) => (String.valueOf(k), canonical(v)) }
        .sortBy(_._1)
        .map { case (k, v) => s"${quote(k)}:$v" }
        .mkString("{", ",", "}")
    case xs: Iterable[_] =>
      xs.toSeq.map(canonical).filter(c => c != "null" && c != "\"\"")
        .sorted.mkString("[", ",", "]")
    case other => quote(String.valueOf(other).trim)
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }

  def sha256Hex(text: String): String =
    sha256HexBytes(text.getBytes("UTF-8"))

  /** sha-256 over raw bytes — for binary payloads a UTF-8 round-trip
    * would corrupt (invalid sequences collapse to U+FFFD). */
  def sha256HexBytes(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256")
      .digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Content id of a canonical tree (advisory identity). */
  def contentId(value: Any): String = sha256Hex(canonical(value))
}
