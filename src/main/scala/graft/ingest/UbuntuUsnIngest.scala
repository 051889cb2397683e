package graft.ingest

import java.sql.Timestamp

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model._

/** Ubuntu USN database ingestion — legacy v1 importer
  * (importers/ubuntu_usn.py:21-103), implemented for registry
  * completeness even though the reference's active registry no longer
  * loads it (superseded by the OSV-format ubuntu feed).
  *
  * The upstream artifact is ONE bz2-compressed JSON object keyed by USN
  * id (`usn-db/database-all.json.bz2`, ~100 MB decompressed): per entry,
  * every well-formed CVE in `cves` becomes its own advisory carrying the
  * USN reference (ubuntu_usn.py:72-92). Non-CVE strings in `cves`
  * (package-name prose like "python-pgsql vulnerabilities") are dropped
  * by the same prefix-match rule as the reference's `is_cve`
  * (utils.py:52-53 — `re.match`, so a PREFIX match, case-insensitive).
  *
  * Scale shape: the db is a single non-splittable JSON map, so the parse
  * streams it token-by-token (one USN entry materialized at a time,
  * bounded memory) and the per-dump row fans out to per-CVE rows inside
  * `flatMap` — downstream repartitioning restores parallelism after the
  * single-file scan, the same boundary every one-file feed has.
  */
object UbuntuUsnIngest {

  val dbUrl = "https://usn.ubuntu.com/usn-db/database-all.json.bz2"

  // utils.py:52-53: re.match (anchored prefix, not fullmatch), IGNORECASE
  private val CveRe = "(?i)^CVE-[0-9]{4}-[0-9]{4,19}".r

  def isCve(s: String): Boolean =
    s != null && CveRe.findPrefixOf(s).isDefined

  /** One USN entry → advisories (ubuntu_usn.py:74-92). */
  def entryToAdvisories(datasourceId: String, usnKey: String,
      entry: JsonNode, precedence: Int): Seq[AdvisoryRow] = {
    val id = Option(entry.get("id")).filterNot(_.isNull).map(_.asText)
      .filter(_.nonEmpty)
    val refs = id.toSeq.map(i =>
      ReferenceRow(s"https://usn.ubuntu.com/$i/", "", s"USN-$i"))
    val url = refs.headOption.map(_.url).getOrElse(dbUrl)
    val cves = Option(entry.get("cves")).filterNot(_.isNull).toSeq
      .flatMap { arr =>
        val it = arr.elements()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().asText
        b.result()
      }
    cves.filter(isCve).map { cve =>
      AdvisoryRow(datasourceId,
        // v1 AdvisoryData carries no advisory id; derive a deterministic
        // one from the (USN, CVE) pair the reference emits one row per
        advisory_id = s"usn-${id.getOrElse(usnKey)}-$cve",
        summary = "",
        aliases = Seq(cve),
        references = refs,
        severities = Seq.empty, weaknesses = Seq.empty,
        affected = Seq.empty,
        date_collected = new Timestamp(0L), date_published = None,
        url = url, precedence = precedence)
    }
  }

  /** Parse one whole db dump (decompressed JSON text) streaming —
    * only one USN entry is resident at a time. Failure containment has
    * two measured classes (Jackson 2.21 semantics, pinned by
    * ParserRobustnessSpec):
    *  - corruption INSIDE a structurally-entered value (a bad token
    *    within an entry's object/array — e.g. a bare NaN in `cves`)
    *    consumes the offending token as it throws; the resync walks to
    *    the next top-level FIELD_NAME and ONLY that entry is lost;
    *  - corruption AT a top-level token boundary (garbage where a
    *    value should start) kills the tokenizer — the stream aborts,
    *    yielding every entry parsed so far, INCLUDING the entry
    *    preceding the damage (Jackson prefetches, so the error
    *    surfaces on the previous entry's advance; parse-then-advance
    *    below keeps its rows).
    * Resync is best-effort with a bounded retry budget so a
    * non-advancing tokenizer (truncated input, dead parser state)
    * cannot loop; never throws — malformed feed records route to
    * silence, not to job failure. */
  def parseDb(datasourceId: String, json: String,
      precedence: Int = 500): Iterator[AdvisoryRow] = {
    val mapper = new ObjectMapper()
    try {
      val p = new JsonFactory(mapper).createParser(json)
      if (p.nextToken() != JsonToken.START_OBJECT)
        return Iterator.empty

      // Advance to the next FIELD_NAME at the ROOT object's depth (a
      // FIELD_NAME nested inside a partially-consumed entry value is
      // not a resync point), tolerating per-call tokenizer errors up
      // to a budget — Jackson's scanner often consumes the offending
      // bytes as it throws, so retrying walks past garbage; when it
      // cannot advance (truncated input), the budget bounds the loop
      // and the iterator aborts.
      def resync(): JsonToken = {
        // the budget bounds THROWING calls only — a successful advance
        // is progress through finite input and must not count against
        // it (a single kernel-sized entry's valid tail can exceed any
        // fixed token budget; draining the budget on it would lose the
        // whole feed remainder to one early corruption)
        var budget = 10000
        while (budget > 0) {
          val t =
            try p.nextToken()
            catch { case _: Exception =>
              budget -= 1; JsonToken.NOT_AVAILABLE }
          if (t == null) return null
          if (t == JsonToken.FIELD_NAME &&
              p.getParsingContext.getParent != null &&
              p.getParsingContext.getParent.inRoot()) return t
        }
        null
      }

      new Iterator[Seq[AdvisoryRow]] {
        private var tok =
          try p.nextToken() catch { case _: Exception => resync() }
        def hasNext: Boolean = tok == JsonToken.FIELD_NAME
        def next(): Seq[AdvisoryRow] = {
          // parse the entry FIRST; advance separately, so an advance
          // failure (the next entry's corruption, prefetched) cannot
          // discard this entry's already-parsed advisories
          val out =
            try {
              val key = p.currentName()
              p.nextToken()
              val entry = mapper.readTree[JsonNode](p)
              entryToAdvisories(datasourceId, key, entry, precedence)
            } catch {
              case _: Exception => tok = resync(); return Seq.empty
            }
          tok = try p.nextToken() catch { case _: Exception => resync() }
          out
        }
      }.flatten
    } catch {
      case _: Exception => Iterator.empty
    }
  }

  /** raw: (datasource_id, text) — one row per db dump. */
  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 500): Dataset[AdvisoryRow] = {
    import spark.implicits._
    raw.select("datasource_id", "text").as[(String, String)]
      .flatMap { case (ds, text) => parseDb(ds, text, precedence) }
  }

  /** Decompress a bz2 byte payload (the feed's wire format) — the
    * Spark-side analog of ubuntu_usn.py:100-103. */
  def decompressBz2(bytes: Array[Byte]): String = {
    val in = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorInputStream(new java.io.ByteArrayInputStream(bytes))
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
