package graft.sources

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The custom DSv2 sink: batch write commit, overwrite/truncate,
  * multi-epoch streaming write, and epoch-replay idempotence — the
  * write half of the source/sink trait pair (EventGenSourceSpec covers
  * the read half).
  */
class GraftCollectSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val srcFmt = "graft.sources.EventGenSource"
  private val sinkFmt = "graft.sources.GraftCollectSink"

  test("short names resolve through DataSourceRegister") {
    import spark.implicits._
    GraftCollectSink.clear("short")
    spark.read.format("graft-events").option("totalRows", "10").load()
      .write.format("graft-collect").option("name", "short")
      .mode("append").save()
    assert(GraftCollectSink.rows("short").size === 10)
    GraftCollectSink.clear("short")
  }

  test("batch write commits exactly the generated rows") {
    import spark.implicits._
    GraftCollectSink.clear("batch")
    val src = spark.read.format(srcFmt)
      .option("totalRows", "1000").option("numPartitions", "7").load()
    src.write.format(sinkFmt).option("name", "batch").mode("append").save()
    val got = GraftCollectSink.asDataFrame(spark, "batch")
    assert(got.count() === 1000)
    // content equality, not just count: every generated row arrived
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty)
    // append mode appends
    src.limit(1).write.format(sinkFmt).option("name", "batch")
      .mode("append").save()
    assert(GraftCollectSink.rows("batch").size === 1001)
    GraftCollectSink.clear("batch")
  }

  test("overwrite mode truncates the named buffer") {
    import spark.implicits._
    GraftCollectSink.clear("trunc")
    val src = spark.read.format(srcFmt).option("totalRows", "100").load()
    src.write.format(sinkFmt).option("name", "trunc").mode("append").save()
    src.limit(5).write.format(sinkFmt).option("name", "trunc")
      .mode("overwrite").save()
    assert(GraftCollectSink.rows("trunc").size === 5)
    GraftCollectSink.clear("trunc")
  }

  test("streaming write commits every micro-batch exactly once") {
    import spark.implicits._
    GraftCollectSink.clear("stream")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-collect-ckpt-").toString
    val q = spark.readStream.format(srcFmt)
      .option("totalRows", "5000").option("numPartitions", "4")
      .option("rowsPerBatch", "1000")
      .load()
      .writeStream.format(sinkFmt).option("name", "stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(GraftCollectSink.committedEpochs("stream").size >= 5,
      s"expected >=5 epochs, got ${GraftCollectSink.committedEpochs("stream")}")
    val got = GraftCollectSink.asDataFrame(spark, "stream")
    assert(got.count() === 5000)
    assert(got.select(countDistinct($"event_id")).head().getLong(0) === 5000)
    GraftCollectSink.clear("stream")
  }

  test("a replayed epoch is recognized and skipped (exactly-once)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.connector.write.WriterCommitMessage
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    GraftCollectSink.clear("replay")
    val schema = StructType(Seq(StructField("v", LongType)))
    def msg(v: Long): Array[WriterCommitMessage] =
      Array(GraftCollectSink.RowsMessage(Array(InternalRow(v))))
    GraftCollectSink.commitEpoch("replay", "qA", schema, 0L, msg(1),
      truncate = false)
    // checkpoint-recovery path: the engine re-commits the last epoch
    GraftCollectSink.commitEpoch("replay", "qA", schema, 0L, msg(1),
      truncate = false)
    GraftCollectSink.commitEpoch("replay", "qA", schema, 1L, msg(2),
      truncate = false)
    assert(GraftCollectSink.rows("replay").map(_.getLong(0)) === Seq(1L, 2L))
    // a DIFFERENT query's epoch 0 is NOT a replay — epoch ids restart
    // per query, so dedup must be scoped by (queryId, epochId)
    GraftCollectSink.commitEpoch("replay", "qB", schema, 0L, msg(3),
      truncate = false)
    assert(GraftCollectSink.rows("replay").map(_.getLong(0)) ===
      Seq(1L, 2L, 3L))
    GraftCollectSink.clear("replay")
  }
}
