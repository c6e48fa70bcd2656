package graft

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Probes of Spark's OWN parquet read-time upcasts — the foundation of
  * zero-rewrite type widening ([[graft.operators.ManifestTable.widenColumn]]):
  * the log records the widened type and every narrow-era file is read
  * through the wider read schema, so the reader itself must perform the
  * promotion. These pins document exactly which promotions the engine
  * may rely on (and therefore which `widens` admits). */
class WidenProbeSpec extends AnyFunSuite {
  test("parquet reader upcasts int->long and float->double") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("widen-").toString + "/t"
    Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f").write.parquet(d)
    val out = spark.read.schema("i LONG, f DOUBLE").parquet(d)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    info("WIDEN-OK " + out)
    assert(out == Seq((1L, 1.5), (2L, 2.5)))
  }

  test("parquet reader upcasts byte/short along the integral chain") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("widen-").toString + "/t"
    Seq(1, 2).toDF("v")
      .select(col("v").cast("byte").as("b"), col("v").cast("short").as("s"))
      .write.parquet(d)
    val bs = spark.read.schema("b SHORT, s INT").parquet(d)
      .collect().map(r => (r.getShort(0), r.getInt(1))).toSeq.sorted
    assert(bs == Seq((1: Short, 1), (2: Short, 2)))
    val bl = spark.read.schema("b LONG, s LONG").parquet(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(bl == Seq((1L, 1L), (2L, 2L)))
    info("WIDEN-OK byte->short/long, short->int/long")
  }

  test("mixed eras in ONE scan: narrow and wide files under one read schema") {
    val spark = TestSpark.spark
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("widen-").toString + "/t"
    Seq(1, 2).toDF("i").write.parquet(d + "/a")
    Seq(3L, 4L).toDF("i").write.parquet(d + "/b")
    val out = spark.read.schema("i LONG").parquet(d + "/a", d + "/b")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(out == Seq(1L, 2L, 3L, 4L))
  }
}
