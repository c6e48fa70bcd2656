package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

// Temporary placeholders — filled in by subsequent milestones.

object TextAnalysis extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override def oracles: Map[String, String] = Map()
}

object Dedup extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override def oracles: Map[String, String] = Map()
}

object Similarity extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override def oracles: Map[String, String] = Map()
}

object Multimodal extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override def oracles: Map[String, String] = Map()
}
