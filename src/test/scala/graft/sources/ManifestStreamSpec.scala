package graft.sources

import graft.operators.ManifestTable
import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The manifest table's streaming face through the DSv2 front door:
  * `spark.readStream.format("graft-manifest")` tails the commit log
  * with version offsets — each micro-batch reads exactly the files
  * its data versions added, compaction rewrites are invisible, and
  * checkpointed offsets make a restarted stream consume ONLY the
  * versions committed since (exactly-once across restarts, the Delta
  * streaming-source contract).
  */
class ManifestStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-mstream-").toString

  test("AvailableNow drain reads the full history once, skipping " +
      "compaction rewrites") {
    import spark.implicits._
    val root = fresh()
    val work = s"$root/t"
    ManifestTable.create(spark, work,
      (0L until 40L).toDF("k").repartition(4))
    ManifestTable.append(spark, work,
      (40L until 70L).toDF("k").repartition(4))
    ManifestTable.compactCommit(spark, work, targetBytes = 64L << 20)
    ManifestTable.append(spark, work, (70L until 90L).toDF("k"))
    val name = s"ms_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = spark.readStream.format("graft-manifest").load(work)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name)
    // the compaction version rewrote 70 rows into new files — reading
    // its adds would double them
    assert(got.count() == 90)
    assert(got.agg(sum($"k")).first().getLong(0) == (0L until 90L).sum)
    assert(got.select($"k").distinct().count() == 90)
    spark.catalog.dropTempView(name)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("checkpointed offsets: a restarted stream consumes only the " +
      "versions committed since") {
    import spark.implicits._
    val root = fresh()
    val work = s"$root/t"
    ManifestTable.create(spark, work, (0L until 10L).toDF("k"))
    // memory sink refuses checkpoint recovery — the file sink is the
    // restartable one; batch ids in its log also prove exactly-once
    val out = s"$root/out"
    def drainOnce(): Unit = {
      val q = spark.readStream.format("graft-manifest").load(work)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainOnce()
    assert(spark.read.parquet(out).count() == 10)
    ManifestTable.append(spark, work, (10L until 25L).toDF("k"))
    ManifestTable.append(spark, work, (25L until 30L).toDF("k"))
    drainOnce()
    // the second run resumed from the checkpointed version offset:
    // total output = history once + the two new versions once
    val got = spark.read.parquet(out)
    assert(got.count() == 30,
      s"restart re-read or skipped history: ${got.count()} rows")
    assert(got.select($"k").distinct().count() == 30)
    assert(got.agg(sum($"k")).first().getLong(0) == (0L until 30L).sum)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("startingVersion skips the head of the log") {
    import spark.implicits._
    val root = fresh()
    val work = s"$root/t"
    ManifestTable.create(spark, work, (0L until 10L).toDF("k"))
    ManifestTable.append(spark, work, (10L until 18L).toDF("k"))
    val name = s"ms_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = spark.readStream.format("graft-manifest")
      .option("startingVersion", 2).load(work)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(name).count() == 8)
    spark.catalog.dropTempView(name)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("writeStream.format(graft-manifest): each batch is one commit, " +
      "redelivery is a log-level no-op, restart appends only new batches") {
    import spark.implicits._
    val root = fresh()
    val work = s"$root/t"
    val stage = s"$root/stage"
    (0L until 40L).toDF("k").repartition(4)
      .write.parquet(stage) // 4 files → 4 micro-batches
    val schema = spark.read.parquet(stage).schema
    def drainOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
        .writeStream.format("graft-manifest")
        .option("path", work)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainOnce()
    // 4 batches → 4 versions (the first bootstrapped the table)
    assert(ManifestTable.versions(spark, work) == Vector(1, 2, 3, 4))
    assert(ManifestTable.read(spark, work).count() == 40)
    // a redelivered batch (same checkpoint identity, same batchId)
    // must be a log-level no-op
    val snap = ManifestTable.snapshot(spark, work)
    val marker = snap.txns.keys.find(_.endsWith(":0")).get
    val v = ManifestTable.append(spark, work,
      (900L until 950L).toDF("k"), txn = Some(marker))
    assert(v == ManifestTable.txnVersion(spark, work, marker).get)
    assert(ManifestTable.read(spark, work).count() == 40,
      "redelivered batch appended instead of no-op")
    // restart with the same checkpoint after new input: only the new
    // file becomes a new batch/version
    (100L until 110L).toDF("k").coalesce(1)
      .write.mode("append").parquet(stage)
    drainOnce()
    assert(ManifestTable.read(spark, work).count() == 50)
    assert(ManifestTable.versions(spark, work).size == 5)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("streaming projection prunes columns through the native scan") {
    import spark.implicits._
    val root = fresh()
    val work = s"$root/t"
    ManifestTable.create(spark, work,
      (0L until 50L).map(k => (k, k * 3, s"p$k")).toDF("k", "v", "tag"))
    val name = s"ms_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = spark.readStream.format("graft-manifest").load(work)
      .select($"k", $"v") // tag never read
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name)
    assert(got.columns.toSeq == Seq("k", "v") && got.count() == 50)
    assert(got.agg(sum($"v")).first().getLong(0) == (0L until 50L).map(_ * 3).sum)
    spark.catalog.dropTempView(name)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
