package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared local session for operator specs (small [4] to keep tests fast). */
trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.session
}

object SparkTestSession {
  lazy val session: SparkSession = graft.core.Sessions.local("graft-test", "4")
}
