package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Apache HTTPD advisories ingestion (S2): one CVE JSON 4.0 record per
  * advisory from httpd.apache.org/security/json
  * (pipelines/v2_importers/apache_httpd_importer.py:141-350).
  *
  * Declarative mapping: `impact[].other` carries the apache_httpd textual
  * severity, `affects...version_data` rows carry (comparator, version)
  * constraints, and timeline "release" entries become inverted `!=`
  * constraints exactly like the reference's VersionConstraint.invert().
  */
object ApacheHttpdIngest {

  private val VersionData = StructType(Seq(
    StructField("version_value", StringType),
    StructField("version_affected", StringType)))
  private val LangValue = StructType(Seq(
    StructField("lang", StringType),
    StructField("value", StringType)))
  private val ProblemType = StructType(Seq(
    StructField("description", ArrayType(LangValue))))
  private val ProductData = StructType(Seq(
    StructField("version", StructType(Seq(
      StructField("version_data", ArrayType(VersionData)))))))
  private val VendorData = StructType(Seq(
    StructField("product", StructType(Seq(
      StructField("product_data", ArrayType(ProductData)))))))
  val cveSchema: StructType = StructType(Seq(
    StructField("CVE_data_meta", StructType(Seq(
      StructField("ID", StringType)))),
    StructField("description", StructType(Seq(
      StructField("description_data", ArrayType(LangValue))))),
    StructField("impact", ArrayType(StructType(Seq(
      StructField("other", StringType))))),
    StructField("problemtype", StructType(Seq(
      StructField("problemtype_data", ArrayType(ProblemType))))),
    StructField("affects", StructType(Seq(
      StructField("vendor", StructType(Seq(
        StructField("vendor_data", ArrayType(VendorData)))))))),
    StructField("timeline", ArrayType(StructType(Seq(
      StructField("time", StringType),
      StructField("value", StringType)))))))

  private val BaseUrl = "https://httpd.apache.org/security/json/"

  /** Ancient svn tags that are not versions
    * (apache_httpd_importer.py:161-223 ignorable_versions): anything not
    * shaped like a dotted release is dropped rather than enumerated. */
  private def versionLike(v: org.apache.spark.sql.Column) =
    v.rlike("^[0-9]+(\\.[0-9]+)*$")

  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 200): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val o = raw.withColumn("c", from_json(col("json"), cveSchema))
      .select(col("datasource_id"), col("c.*"))
      .filter(col("CVE_data_meta.ID").isNotNull)

    val alias = col("CVE_data_meta.ID")
    val advUrl = concat(lit(BaseUrl), alias, lit(".json"))
    val summary = try_element_at(filter(
      coalesce(col("description.description_data"),
        array().cast("array<struct<lang:string,value:string>>")),
      d => d.getField("lang") === "eng"), lit(1))

    val sev = try_element_at(filter(transform(coalesce(col("impact"),
      array().cast("array<struct<other:string>>")),
      i => i.getField("other")), v => v.isNotNull), lit(1))
    val sevs = when(sev.isNotNull, array(struct(
      lit("apache_httpd").as("scoring_system"), sev.as("value"),
      lit("").as("scoring_elements"), advUrl.as("url"))))
      .otherwise(array().cast(
        "array<struct<scoring_system:string,value:string," +
          "scoring_elements:string,url:string>>"))

    val versionRows = flatten(transform(
      coalesce(col("affects.vendor.vendor_data"),
        array().cast(ArrayType(VendorData))),
      vd => flatten(transform(
        coalesce(vd.getField("product").getField("product_data"),
          array().cast(ArrayType(ProductData))),
        pd => coalesce(pd.getField("version").getField("version_data"),
          array().cast(ArrayType(VersionData)))))))

    // {>=, !<} → >= ; <= → <= ; = → = ; ?= and unknowns drop
    val constraints = filter(transform(versionRows, v => {
      val cmp = v.getField("version_affected")
      val ver = v.getField("version_value")
      when(versionLike(ver),
        when(cmp.isin(">=", "!<"), concat(lit(">="), ver))
          .when(cmp === "<=", concat(lit("<="), ver))
          .when(cmp === "=", concat(lit("="), ver)))
    }), c => c.isNotNull)

    val timeline = coalesce(col("timeline"),
      array().cast("array<struct<time:string,value:string>>"))
    val datePublished = try_element_at(transform(filter(timeline,
      t => t.getField("value") === "public"), t => t.getField("time")), lit(1))
    // "x.y.z release" / "release x.y.z" entries → inverted != constraints
    val fixedFromTimeline = filter(transform(
      filter(timeline, t => t.getField("value").contains("release") &&
        !t.getField("value").contains("never")),
      t => {
        val words = split(t.getField("value"), " ")
        val first = try_element_at(words, lit(1))
        val last = try_element_at(words, lit(-1))
        when(last.contains("release") && versionLike(first), first)
          .when(first.contains("release") && versionLike(last), last)
      }), v => v.isNotNull)
    val inverted = transform(fixedFromTimeline, v => concat(lit("!="), v))

    val allConstraints = concat(constraints, inverted)

    // a problemtype description without a CWE number yields '' from
    // regexp_extract — an ANSI cast would throw (captured CVE-1999-1199
    // has a free-text problemtype), so gate the cast on a real match
    val weaknesses = array_sort(array_distinct(filter(flatten(transform(
      coalesce(col("problemtype.problemtype_data"),
        array().cast(ArrayType(ProblemType))),
      p => transform(coalesce(p.getField("description"),
        array().cast(ArrayType(LangValue))),
        d => when(d.getField("value").rlike("CWE-\\d+"),
          regexp_extract(d.getField("value"), "CWE-(\\d+)", 1)
            .cast("int"))))), w => w.isNotNull)))

    o.select(
      col("datasource_id"),
      alias.as("advisory_id"),
      coalesce(summary.getField("value"), lit("")).as("summary"),
      array().cast("array<string>").as("aliases"),
      array(struct(advUrl.as("url"), lit("advisory").as("reference_type"),
        alias.as("reference_id"))).as("references"),
      sevs.as("severities"),
      weaknesses.as("weaknesses"),
      when(size(allConstraints) > 0, array(struct(
        lit("pkg:apache/httpd").as("purl"),
        concat(lit("vers:semver/"), array_join(allConstraints, "|"))
          .as("affecting_vers"),
        concat(lit("vers:semver/"),
          array_join(transform(fixedFromTimeline,
            v => concat(lit("="), v)), "|")).as("fixed_vers"))))
        .otherwise(array().cast(
          "array<struct<purl:string,affecting_vers:string,fixed_vers:string>>"))
        .as("affected"),
      coalesce(to_timestamp(datePublished),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(datePublished).as("date_published"),
      advUrl.as("url"),
      lit(precedence).as("precedence"))
      .as[AdvisoryRow]
  }
}
