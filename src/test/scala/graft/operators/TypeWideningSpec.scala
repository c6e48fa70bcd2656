package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Laws of zero-rewrite type widening ([[ManifestTable.widenColumn]],
  * Delta 3.x's `typeWidening` shape): the log re-declares a column at a
  * wider type, narrow-era files stay on disk, and every read face
  * upcasts them at scan time. */
class TypeWideningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-tw-").toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  test("lifecycle: append int -> widen -> append long; both eras read " +
      "back exact at the wide type, time travel shows each era's schema") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0 until 100).map(i => (i, s"n$i")).toDF("v", "note"))
    ManifestTable.widenColumn(spark, dir, "v", LongType)
    ManifestTable.append(spark, dir,
      (100L until 200L).map(i => (i + 3000000000L, s"n$i")).toDF("v", "note"))
    val latest = ManifestTable.read(spark, dir)
    assert(latest.schema("v").dataType == LongType)
    assert(latest.count() == 200)
    assert(latest.agg(sum($"v")).first().getLong(0) ==
      (0L until 100L).sum + (100L until 200L).map(_ + 3000000000L).sum)
    // each era keeps its own declared schema under time travel
    assert(ManifestTable.read(spark, dir, Some(1))
      .schema("v").dataType == IntegerType)
    assert(ManifestTable.read(spark, dir, Some(2))
      .schema("v").dataType == LongType)
    assert(ManifestTable.read(spark, dir, Some(1)).count() == 100)
    cleanup(dir)
  }

  test("refusals: narrowing, non-numeric coercion, unknown column") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 10L).toDF("v"))
    intercept[IllegalArgumentException] {
      ManifestTable.widenColumn(spark, dir, "v", IntegerType) // narrowing
    }
    intercept[IllegalArgumentException] {
      ManifestTable.widenColumn(spark, dir, "v", StringType)
    }
    intercept[RuntimeException] {
      ManifestTable.widenColumn(spark, dir, "missing", LongType)
    }
    // nothing committed by the refusals
    assert(ManifestTable.versions(spark, dir) == Vector(1))
    cleanup(dir)
  }

  test("appendEvolve widens automatically on wider input and upcasts " +
      "nothing on narrower input") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0 until 50).map(i => (i, i.toFloat / 2)).toDF("v", "w"))
    // wider incoming: the commit widens the log types (mergeSchema +
    // typeWidening), old files upcast
    ManifestTable.appendEvolve(spark, dir,
      (50L until 100L).map(i => (i + 3000000000L, i.toDouble / 2))
        .toDF("v", "w"))
    val after = ManifestTable.read(spark, dir)
    assert(after.schema("v").dataType == LongType)
    assert(after.schema("w").dataType == DoubleType)
    assert(after.count() == 100)
    assert(after.agg(sum($"v")).first().getLong(0) ==
      (0L until 50L).sum + (50L until 100L).map(_ + 3000000000L).sum)
    // narrower incoming after the widen: accepted as-is, reads upcast
    ManifestTable.appendEvolve(spark, dir,
      (100 until 120).map(i => (i, i.toFloat)).toDF("v", "w"))
    val last = ManifestTable.read(spark, dir)
    assert(last.schema("v").dataType == LongType)
    assert(last.count() == 120)
    assert(last.filter($"v" >= 100L && $"v" < 120L).count() == 20)
    cleanup(dir)
  }

  test("widen composes with MOR deletes: DV-era reads upcast through " +
      "the anti-join face") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0 until 100).map(i => (i, i % 7)).toDF("k", "g"))
    ManifestTable.deleteRowsMor(spark, dir, col("k") % 10 === 3)
    ManifestTable.widenColumn(spark, dir, "k", LongType)
    val got = ManifestTable.read(spark, dir)
    assert(got.schema("k").dataType == LongType)
    assert(got.count() == 90)
    assert(got.filter($"k" % 10 === 3).count() == 0)
    // and deleting AFTER the widen still works on the mixed-era table
    ManifestTable.deleteRowsMor(spark, dir, col("k") % 10 === 4)
    assert(ManifestTable.read(spark, dir).count() == 80)
    cleanup(dir)
  }

  test("widen composes with column mapping: rename then widen, reads " +
      "exact under the logical name") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0 until 60).map(i => (i, s"n$i")).toDF("v", "note"))
    ManifestTable.renameColumn(spark, dir, "v", "amount")
    ManifestTable.widenColumn(spark, dir, "amount", LongType)
    ManifestTable.append(spark, dir,
      Seq((5000000000L, "big")).toDF("amount", "note"))
    val got = ManifestTable.read(spark, dir)
    assert(got.schema("amount").dataType == LongType)
    assert(got.agg(sum($"amount")).first().getLong(0) ==
      (0L until 60L).sum + 5000000000L)
    cleanup(dir)
  }

  test("compaction retires the narrow era: post-OPTIMIZE files store " +
      "the wide type and the narrow footers are gone from the snapshot") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0 until 100).toDF("v"))
    ManifestTable.widenColumn(spark, dir, "v", LongType)
    ManifestTable.compactCommit(spark, dir, targetBytes = 512L << 20)
    val snap = ManifestTable.snapshot(spark, dir)
    val footer = spark.read.parquet(snap.paths: _*).schema
    assert(footer("v").dataType == LongType) // rewritten wide
    assert(ManifestTable.read(spark, dir)
      .agg(sum($"v")).first().getLong(0) == (0L until 100L).sum)
    cleanup(dir)
  }

  test("file statistics survive the widen: narrow-era [lo, hi] still " +
      "prunes long predicates (same long stats space)") {
    import spark.implicits._
    val dir = fresh()
    // 4 files with disjoint ranges, stats recorded in the int era
    ManifestTable.create(spark, dir,
      (0 until 400).map(i => (i, i % 5)).toDF("v", "g")
        .repartitionByRange(4, $"v"), statsCol = Some("v"))
    ManifestTable.widenColumn(spark, dir, "v", LongType)
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.entries.size == 4)
    // the planner's window [350, 380] overlaps exactly one file (the
    // declared statsCol's int-era bounds ride e.lo/e.hi — long space)
    val hit = snap.entries.count(e =>
      e.hi.exists(_ >= 350L) && e.lo.exists(_ <= 380L))
    assert(hit == 1)
    // and the pruned read face scans one file, returns the exact rows
    val (got, nLive, nAll) =
      ManifestTable.readRange(spark, dir, "v", 350L, 380L)
    assert(nLive == 1 && nAll == 4)
    assert(got.count() == 31)
    cleanup(dir)
  }

  test("CDF reads uniformly at the feed-end schema across the " +
      "widening boundary") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0 until 10).toDF("v"))
    ManifestTable.widenColumn(spark, dir, "v", LongType)
    ManifestTable.append(spark, dir, Seq(4000000000L).toDF("v"))
    val feed = ManifestTable.changeFeedRows(spark, dir, 0, 3)
    assert(feed.schema("v").dataType == LongType)
    assert(feed.filter($"_change_type" === "insert").count() == 11)
    assert(feed.agg(sum($"v")).first().getLong(0) ==
      (0L until 10L).sum + 4000000000L)
    cleanup(dir)
  }

  test("SQL face: ALTER TABLE ALTER COLUMN TYPE widens through the " +
      "catalog; the DSv2 scan upcasts the narrow era") {
    val cat = s"g${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = java.nio.file.Files.createTempDirectory("graft-twc-").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"CREATE TABLE $cat.w (v INT, note STRING)")
      spark.sql(s"INSERT INTO $cat.w SELECT CAST(id AS INT), " +
        "concat('n', id) FROM range(100)")
      spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN v TYPE BIGINT")
      spark.sql(s"INSERT INTO $cat.w VALUES (6000000000, 'big')")
      val got = spark.sql(s"SELECT sum(v), count(*) FROM $cat.w").first()
      assert(got.getLong(0) == (0L until 100L).sum + 6000000000L)
      assert(got.getLong(1) == 101L)
      assert(spark.table(s"$cat.w").schema("v").dataType == LongType)
      // a non-widening ALTER stays refused
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN v TYPE INT")
      }
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh))
    }
  }
}
