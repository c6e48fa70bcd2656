package graft.sources

import graft.operators.ManifestTable
import graft.streaming.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 front door: `spark.read.format("graft-manifest")` must
  * resolve versions like the Scala API, pin the plan to the resolved
  * snapshot, push filters into the NATIVE parquet scan, and prune
  * files from manifest stats before any footer is opened.
  */
class GraftManifestSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-dsv2-").toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  /** Count the parquet files the DSv2 scan actually plans. */
  private def plannedFiles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.partitions.flatten.map {
        case fp: FilePartition => fp.files.length
        case _ => 1
      }.sum
    }.getOrElse(sys.error("no BatchScanExec in the plan"))

  test("format read resolves latest and versionAsOf exactly") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 100L).toDF("k"))
    ManifestTable.append(spark, dir, (100L until 250L).toDF("k"))
    val latest = spark.read.format("graft-manifest").load(dir)
    assert(latest.count() == 250)
    val v1 = spark.read.format("graft-manifest")
      .option("versionAsOf", 1).load(dir)
    assert(v1.count() == 100 &&
      v1.agg(sum($"k")).first().getLong(0) == (0L until 100L).sum)
    cleanup(dir)
  }

  test("the plan is PINNED to the resolved snapshot: a commit after " +
      "planning is invisible (snapshot isolation through the format)") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 50L).toDF("k"))
    val pinned = spark.read.format("graft-manifest").load(dir)
    ManifestTable.append(spark, dir, (50L until 80L).toDF("k"))
    assert(pinned.count() == 50, "a post-planning commit leaked into a " +
      "pinned DataFrame")
    assert(spark.read.format("graft-manifest").load(dir).count() == 80)
    cleanup(dir)
  }

  test("timestampAsOf resolves by publish time") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 10L).toDF("k"))
    Thread.sleep(1100) // mtime granularity is a full second on some FS
    val between = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(1100)
    ManifestTable.append(spark, dir, (10L until 30L).toDF("k"))
    val asOf = spark.read.format("graft-manifest")
      .option("timestampAsOf", between.toString).load(dir)
    assert(asOf.count() == 10)
    cleanup(dir)
  }

  test("schema comes from the LOG: pre-evolution files read null-filled " +
      "through the format") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 20L).map(k => (k, k * 2)).toDF("k", "v"))
    ManifestTable.appendEvolve(spark, dir,
      (20L until 25L).map(k => (k, k * 2, s"t$k")).toDF("k", "v", "tag"))
    val got = spark.read.format("graft-manifest").load(dir)
    assert(got.columns.toSeq == Seq("k", "v", "tag"))
    assert(got.filter($"tag".isNull).count() == 20)
    // time travel shows the pre-evolution schema
    assert(spark.read.format("graft-manifest").option("versionAsOf", 1)
      .load(dir).columns.toSeq == Seq("k", "v"))
    cleanup(dir)
  }

  test("manifest stats prune files from PLANNING; parquet pushdown " +
      "still reaches the native scan") {
    import spark.implicits._
    val dir = fresh()
    // three disjoint key ranges, 3 files each: range-tight stats
    ManifestTable.create(spark, dir,
      (0L until 100L).toDF("k").repartition(3), statsCol = Some("k"))
    ManifestTable.append(spark, dir,
      (100L until 200L).toDF("k").repartition(3), statsCol = Some("k"))
    ManifestTable.append(spark, dir,
      (200L until 300L).toDF("k").repartition(3), statsCol = Some("k"))
    val all = spark.read.format("graft-manifest").load(dir)
    assert(plannedFiles(all) == 9)
    val mid = all.filter($"k" >= 120L && $"k" <= 180L)
    assert(plannedFiles(mid) < 9 && plannedFiles(mid) >= 1,
      s"stats pruning did not fire: ${plannedFiles(mid)} of 9 files planned")
    assert(mid.count() == 61 &&
      mid.agg(min($"k"), max($"k")).head() ===
        org.apache.spark.sql.Row(120L, 180L))
    // the pushed filter must reach the NATIVE parquet scan too
    val explained = mid.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedFilters") &&
      explained.contains("GreaterThanOrEqual(k,120)"),
      s"parquet pushdown missing:\n$explained")
    cleanup(dir)
  }

  test("changesFromVersion reads exactly the rows data versions added, " +
      "skipping compaction rewrites") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 40L).toDF("k")
      .repartition(4))
    ManifestTable.append(spark, dir, (40L until 70L).toDF("k")
      .repartition(4))
    ManifestTable.compactCommit(spark, dir, targetBytes = 64L << 20)
    ManifestTable.append(spark, dir, (70L until 90L).toDF("k"))
    val changes = spark.read.format("graft-manifest")
      .option("changesFromVersion", 1).load(dir)
    // v2 + v4 adds; the v3 compaction rewrote v1+v2's rows into new
    // files — counting those would double every compacted row
    assert(changes.count() == 50)
    assert(changes.agg(sum($"k")).first().getLong(0) == (40L until 90L).sum)
    cleanup(dir)
  }
}
