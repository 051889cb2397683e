package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CWE weakness dimension: cwe_id → canonical weakness name.
  *
  * The reference resolves weakness ids against the cwe2 package's full
  * MITRE catalog at serving time (models.py:552-582 `get_cwes`). Here
  * the catalog is a bundled TSV resource joined as a broadcast
  * dimension — O(1k) rows forever, it grows with the CWE standard, not
  * with the data, so the weakness fact side never shuffles for the
  * lookup at any scale.
  *
  * The bundled file is a curated ~175-entry subset of well-known CWE
  * ids with their canonical names (public MITRE data): this sandbox has
  * no network egress and no cwe2 data file to vendor the complete
  * ~940-entry export from. Dropping a full MITRE export (same TSV
  * shape: `id<TAB>name`) over `/graft/cwe_catalog.tsv` upgrades every
  * consumer with no code change — the loader is schema-stable.
  */
object CweCatalog {

  private val ResourcePath = "/graft/cwe_catalog.tsv"

  /** cwe id → name, loaded once per JVM from the bundled resource. */
  lazy val map: Map[Int, String] =
    TsvResource.load(ResourcePath)((k, v) => k.toInt -> v)

  /** The catalog as a (cwe_id, cwe_name) DataFrame for broadcast joins. */
  def dim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    map.toSeq.sortBy(_._1).toDF("cwe_id_num", "name")
  }
}
