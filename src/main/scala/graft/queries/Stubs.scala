package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

// Temporary placeholder — filled in by a subsequent milestone.

object Multimodal extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override def oracles: Map[String, String] = Map()
}
