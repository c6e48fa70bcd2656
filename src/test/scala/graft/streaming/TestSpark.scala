package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.SparkSession

/** Shared session for streaming specs (one JVM-wide session — Spark
  * local mode; specs create isolated hubs/engines on top of it).
  *
  * A `def`, not a `lazy val`: the cluster-parity and chaos-retry
  * suites stop/restart the JVM's session mid-run, and a cached
  * stopped session would poison every suite ordered after them —
  * getOrCreate revives transparently and is cheap when alive.
  */
object TestSpark {
  def spark: SparkSession = GraftSession.local(4, "graft-test")
}
