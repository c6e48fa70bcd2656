package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.SparkSession

/** Shared session for streaming specs (one JVM-wide session — Spark
  * local mode; specs create isolated hubs/engines on top of it).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
}
