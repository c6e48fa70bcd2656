package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md §B). Plain `spark.read.parquet` — filters and column
  * pruning are pushed into the scan by Catalyst, so callers should
  * select/filter on these directly rather than pre-materialize.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table is written with TIMESTAMP(NANOS) `ts`, which the
    * Spark parquet reader rejects by default. Read nanos as LONG and
    * convert to a microsecond timestamp (`div 1000` — truncation,
    * matching DuckDB's ns→µs conversion; the generated data has zero
    * sub-microsecond remainder anyway).
    */
  private def eventsDf: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def events: DataFrame = eventsDf
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
