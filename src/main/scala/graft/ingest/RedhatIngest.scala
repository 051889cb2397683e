package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** RedHat CSAF 2.0 advisory ingestion (S2): RHSA/RHEA/RHBA records
  * published as one CSAF JSON per advisory
  * (pipelines/v2_importers/redhat_importer.py:37-185).
  *
  * CSAF is plain JSON, so the whole parse is one `from_json` with an
  * explicit schema plus declarative array transforms — no per-row
  * imperative code, fully inside whole-stage codegen.
  */
object RedhatIngest {

  private val ProductHelper = StructType(Seq(
    StructField("product_identification_helper", StructType(Seq(
      StructField("purl", StringType))))))
  private val ProductLeaf = StructType(Seq(
    StructField("product", ProductHelper)))
  private val ProductBranch = StructType(Seq(
    StructField("category", StringType),
    StructField("branches", ArrayType(ProductLeaf))))

  private val NoteType = StructType(Seq(
    StructField("category", StringType),
    StructField("text", StringType)))
  private val RefType = StructType(Seq(
    StructField("category", StringType),
    StructField("summary", StringType),
    StructField("url", StringType)))
  private val DocumentType = StructType(Seq(
    StructField("csaf_version", StringType),
    StructField("aggregate_severity",
      StructType(Seq(StructField("text", StringType)))),
    StructField("notes", ArrayType(NoteType)),
    StructField("references", ArrayType(RefType)),
    StructField("tracking", StructType(Seq(
      StructField("id", StringType),
      StructField("initial_release_date", StringType))))))
  private val TreeType = StructType(Seq(
    StructField("branches", ArrayType(StructType(Seq(
      StructField("branches", ArrayType(ProductBranch))))))))

  val csafSchema: StructType = StructType(Seq(
    StructField("document", DocumentType),
    StructField("vulnerabilities", ArrayType(
      StructType(Seq(StructField("cve", StringType))))),
    StructField("product_tree", TreeType)))

  private val FeedBase =
    "https://security.access.redhat.com/data/csaf/v2/advisories/"

  /** Parse a DataFrame of raw CSAF JSON strings (columns `datasource_id`,
    * `json`, optional `path` for the advisory URL suffix). */
  def parse(spark: SparkSession, raw: DataFrame,
      precedence: Int = 200): Dataset[AdvisoryRow] = {
    import spark.implicits._
    val withPath = if (raw.columns.contains("path")) raw
      else raw.withColumn("path", lit(""))
    val o = withPath
      .withColumn("csaf", from_json(col("json"), csafSchema))
      .select(col("datasource_id"), col("path"), col("csaf.*"))
      .filter(col("document.csaf_version").isNull ||
        col("document.csaf_version") === "2.0")

    val advUrl = when(length(col("path")) > 0, concat(lit(FeedBase),
      regexp_extract(col("path"), "([^/]+/[^/]+)$", 0)))
      .otherwise(concat(lit(FeedBase), lower(col("document.tracking.id"))))

    // notes sans legal_disclaimer, joined like the reference's "\n\n"
    val summary = array_join(transform(filter(
      coalesce(col("document.notes"),
        array().cast("array<struct<category:string,text:string>>")),
      n => n.getField("category") =!= "legal_disclaimer"),
      n => n.getField("text")), "\n\n")

    val refs = transform(coalesce(col("document.references"),
      array().cast("array<struct<category:string,summary:string,url:string>>")),
      r => struct(
        r.getField("url").as("url"),
        when(r.getField("url").startsWith("https://bugzilla.redhat.com/"),
          "bug")
          .when(r.getField("url").contains("/errata/"), "advisory")
          .when(r.getField("url").contains("/security/cve/"), "advisory")
          .otherwise("other").as("reference_type"),
        // ids only where the url tail IS an id: errata (RHSA-…) and
        // CVE pages; everything else stays empty (captured expected)
        when(r.getField("url").startsWith("https://bugzilla.redhat.com/"),
          r.getField("summary"))
          .when(r.getField("url").contains("/errata/"),
            regexp_extract(r.getField("url"), "[^/]+$", 0))
          .when(r.getField("url").contains("/security/cve/"),
            regexp_extract(r.getField("url"), "[^/]+$", 0))
          .otherwise(lit("")).as("reference_id")))

    val sevs = when(col("document.aggregate_severity.text").isNotNull,
      array(struct(
        lit("rhas").as("scoring_system"),
        col("document.aggregate_severity.text").as("value"),
        lit("").as("scoring_elements"),
        advUrl.as("url"))))
      .otherwise(array().cast(
        "array<struct<scoring_system:string,value:string," +
          "scoring_elements:string,url:string>>"))

    // product_tree.branches[0].branches (≠ product_family) → leaf purls;
    // rpm purls with a version become (<v affected, =v fixed) impacts
    // (redhat_importer.py:139-168); rpmmod and versionless purls drop.
    val leafPurls = array_distinct(filter(flatten(transform(
      filter(coalesce(try_element_at(col("product_tree.branches"), lit(1))
        .getField("branches"), array().cast(ArrayType(ProductBranch))),
        b => b.getField("category") =!= "product_family"),
      b => transform(coalesce(b.getField("branches"),
        array().cast(ProductBranch("branches").dataType)),
        p => p.getField("product")
          .getField("product_identification_helper").getField("purl")))),
      p => p.isNotNull && p.startsWith("pkg:rpm/") &&
        p.rlike("@[^?#]+")))

    val affected = transform(leafPurls, p => {
      // purl versions are percent-encoded in CSAF (`%2B` for the rpm
      // module `+`); the reference compares decoded versions
      val version = url_decode(regexp_extract(p, "@([^?#]+)", 1))
      struct(
        regexp_replace(p, "@[^?#]+", "").as("purl"),
        concat(lit("vers:rpm/<"), version).as("affecting_vers"),
        concat(lit("vers:rpm/="), version).as("fixed_vers"))
    })

    o.select(
      col("datasource_id"),
      col("document.tracking.id").as("advisory_id"),
      coalesce(summary, lit("")).as("summary"),
      transform(coalesce(col("vulnerabilities"),
        array().cast("array<struct<cve:string>>")),
        v => v.getField("cve")).as("aliases"),
      refs.as("references"),
      sevs.as("severities"),
      array().cast("array<int>").as("weaknesses"),
      affected.as("affected"),
      coalesce(to_timestamp(col("document.tracking.initial_release_date")),
        to_timestamp(lit("1970-01-01"))).as("date_collected"),
      to_timestamp(col("document.tracking.initial_release_date"))
        .as("date_published"),
      advUrl.as("url"),
      lit(precedence).as("precedence"))
      .filter(col("advisory_id").isNotNull)
      .as[AdvisoryRow]
  }

  /** Read an extracted CSAF archive tree (one JSON per file). */
  def readTree(spark: SparkSession, path: String,
      datasourceId: String = "redhat"): Dataset[AdvisoryRow] = {
    val raw = spark.read.option("wholetext", "true")
      .option("pathGlobFilter", "*.json").text(path)
      .select(col("value").as("json"),
        input_file_name().as("path"),
        lit(datasourceId).as("datasource_id"))
    parse(spark, raw)
  }
}
