package graft

import java.nio.file.Files

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth beyond parquet (SURVEY §2.3 sources
  * row): JSON, CSV, ORC and XML (Spark 4 native) round-trips preserve
  * the documents table exactly; the text source covers raw-line
  * ingest; the built-in rate streaming source drives a query; and
  * dropDuplicatesWithinWatermark bounds streaming dedup state.
  */
class SourceFormatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def docsSorted = Tables(spark, dir).documents
    .orderBy("doc_id").collect().map(_.toString).toList

  test("json round-trip preserves the table") {
    val out = Files.createTempDirectory("graft-json").toString
    Tables(spark, dir).documents.write.mode("overwrite").json(out)
    val back = spark.read.json(out)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.orderBy("doc_id").collect().map(_.toString).toList ===
      docsSorted)
  }

  test("csv round-trip preserves the table (quoted text, header, schema)") {
    val out = Files.createTempDirectory("graft-csv").toString
    Tables(spark, dir).documents.write.mode("overwrite")
      .option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(Tables(spark, dir).documents.schema).csv(out)
    assert(back.orderBy("doc_id").collect().map(_.toString).toList ===
      docsSorted)
  }

  test("orc round-trip preserves the table") {
    val out = Files.createTempDirectory("graft-orc").toString
    Tables(spark, dir).documents.write.mode("overwrite").orc(out)
    assert(spark.read.orc(out).orderBy("doc_id").collect()
      .map(_.toString).toList === docsSorted)
  }

  test("xml round-trip preserves the table (Spark 4 native xml source)") {
    val out = Files.createTempDirectory("graft-xml").toString
    Tables(spark, dir).documents.write.mode("overwrite")
      .option("rowTag", "doc").xml(out)
    val back = spark.read.option("rowTag", "doc")
      .schema(Tables(spark, dir).documents.schema).xml(out)
    assert(back.orderBy("doc_id").collect().map(_.toString).toList ===
      docsSorted)
  }

  test("text source reads raw lines (one-column ingest surface)") {
    val out = Files.createTempDirectory("graft-text").toString
    Tables(spark, dir).documents
      .select(concat_ws("\t", col("doc_id"), col("lang")).as("value"))
      .write.mode("overwrite").text(out)
    val back = spark.read.text(out)
      .select(split(col("value"), "\t").as("p"))
      .select(col("p").getItem(0).cast("long").as("doc_id"),
        col("p").getItem(1).as("lang"))
    val want = Tables(spark, dir).documents.select("doc_id", "lang")
      .orderBy("doc_id").collect().map(_.toString).toList
    assert(back.orderBy("doc_id").collect().map(_.toString).toList === want)
  }

  test("rate streaming source feeds a query") {
    val name = "rate_smoke"
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(100L)).start()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.table(name).isEmpty && System.nanoTime() < deadline)
      Thread.sleep(200)
    q.stop()
    assert(spark.table(name).count() > 0)
  }

  test("dropDuplicatesWithinWatermark: state-bounded streaming dedup") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val t0 = 1700000000000L
    mem.addData(Seq(
      (1L, new java.sql.Timestamp(t0)),
      (1L, new java.sql.Timestamp(t0 + 1000)), // dup within watermark
      (2L, new java.sql.Timestamp(t0 + 2000))))
    val name = "ddww"
    val q = mem.toDS().toDF("k", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
      .select("k")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(name).orderBy("k").collect().map(_.getLong(0)).toList
      === List(1L, 2L))
  }
}
