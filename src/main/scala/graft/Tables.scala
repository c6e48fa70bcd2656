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

  /** The events table's `ts` has been generated with two physical
    * types across harness revisions: TIMESTAMP(NANOS) (which the Spark
    * reader rejects by default — read nanos as LONG, truncate to µs,
    * matching DuckDB's ns→µs conversion) and plain TIMESTAMP(MICROS)
    * (arrives as TIMESTAMP_NTZ — cast to session-time TIMESTAMP, an
    * identity under the engine's fixed UTC session). Normalization is
    * schema-driven so either vintage of the data reads identically.
    */
  private def eventsDf: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTs(t("events"))
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

object Tables {
  import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Normalize an events frame's `ts` onto session-time TIMESTAMP
    * (µs) regardless of how the parquet was written: nanos-as-LONG
    * (legacy TIMESTAMP(NANOS) files under
    * `spark.sql.legacy.parquet.nanosAsLong`) truncates ns→µs exactly
    * like DuckDB; TIMESTAMP_NTZ (plain micros files) casts to the
    * session zone, an identity under the engine's fixed UTC session
    * (GraftSession). Already-LTZ frames pass through untouched.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"events.ts has unsupported physical type $other; expected " +
            "LONG (nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP")
    }
}
