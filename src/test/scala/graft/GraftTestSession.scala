package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (single JVM under sbt). */
object GraftTestSession {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"
}
