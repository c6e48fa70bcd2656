package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The production state-store backend, actually exercised: several
  * StreamingOps comments say "in production the state store is on
  * RocksDB" — this spec makes that a tested claim, not prose. The
  * same stateful topologies (keyed aggregate; dropDuplicates) run
  * once under the default HDFS-backed provider and once under
  * `RocksDBStateStoreProvider` (bundled with Spark — rocksdbjni is
  * on the classpath), and must produce identical results. The
  * provider is a session conf read at query start, so it is set and
  * restored around each drain; checkpoint dirs are fresh per run so
  * the two backends never share state.
  */
class RocksDBStateStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Drain `df` to a memory sink under the given state-store
    * provider (None = Spark's default), fresh checkpoint.
    */
  private def drainWith(provider: Option[String],
      df: org.apache.spark.sql.DataFrame,
      mode: OutputMode): Seq[String] = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    provider.foreach(spark.conf.set(key, _))
    if (provider.isEmpty) spark.conf.unset(key)
    val name = s"rocks_spec_${System.nanoTime()}"
    try {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode)
        .option("checkpointLocation",
          java.nio.file.Files
            .createTempDirectory("graft-rocks-ckpt-").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    spark.table(name).collect().map(_.toString).toSeq.sorted
  }

  private def eventStream = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = "/root/testdata/sf0.001/events.parquet"
    val schema = spark.read.parquet(src).schema
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rocks-src-").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(src))
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(dir))
  }

  test("keyed streaming aggregate: RocksDB backend == default backend") {
    import spark.implicits._
    def agg = eventStream
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(FLOOR(value * 100) AS BIGINT)")).as("cents"))
    val default = drainWith(None, agg, OutputMode.Complete())
    val rocks = drainWith(Some(RocksProvider), agg, OutputMode.Complete())
    assert(rocks === default)
    assert(default.nonEmpty)
  }

  test("streaming dropDuplicates: RocksDB backend == default backend") {
    import spark.implicits._
    def dedup = eventStream
      .select($"user_id", $"event_type")
      .dropDuplicates("user_id", "event_type")
    val default = drainWith(None, dedup, OutputMode.Append())
    val rocks = drainWith(Some(RocksProvider), dedup, OutputMode.Append())
    assert(rocks === default)
    assert(default.nonEmpty)
  }
}
