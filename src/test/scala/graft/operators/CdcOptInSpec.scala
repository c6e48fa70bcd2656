package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of OPT-IN write-time CDC capture (Delta's
  * `enableChangeDataFeed` is opt-in for the same reason): only tables
  * that declare it pay the capture diff on COW DML; feeds stay
  * readable either way — an uncaptured rewrite surfaces as whole-file
  * re-inserts, never an error and never a wrong row. */
class CdcOptInSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-cdc-").toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  private def captures(dir: String): Int = {
    val d = new java.io.File(dir, "_change_data")
    if (!d.exists()) 0 else d.listFiles().count(!_.getName.startsWith("."))
  }

  private def withCatalog(body: (String, String) => Unit): Unit = {
    val cat = s"gcdc_${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = java.nio.file.Files
      .createTempDirectory("graft-cdcw-").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(cat, wh)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(wh))
    }
  }

  test("default OFF: SQL UPDATE/DELETE write no capture, the feed " +
      "degrades to file-level inserts, results stay exact") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.d (k BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.d SELECT id, id * 10 FROM range(100)")
      spark.sql(s"UPDATE $cat.d SET v = v + 1 WHERE k % 5 = 0")
      spark.sql(s"DELETE FROM $cat.d WHERE k >= 90")
      val dir = s"$wh/d"
      assert(captures(dir) == 0, "no table opt-in => no capture diff")
      // the DML itself is exact regardless
      assert(spark.table(s"$cat.d").count() == 90)
      // the feed stays readable: no update/delete images, only inserts
      val to = ManifestTable.snapshot(spark, dir).version
      val types = ManifestTable.changeFeedRows(spark, dir, 0, to)
        .select("_change_type").distinct()
        .collect().map(_.getString(0)).toSet
      assert(types == Set("insert"))
    }
  }

  test("TBLPROPERTIES ('cdc'='true') opts in at birth: captures exist " +
      "and the feed carries exact images") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.e (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('cdc'='true')")
      spark.sql(s"INSERT INTO $cat.e SELECT id, id * 10 FROM range(100)")
      spark.sql(s"UPDATE $cat.e SET v = v + 1 WHERE k % 5 = 0")
      val dir = s"$wh/e"
      assert(captures(dir) == 1)
      val to = ManifestTable.snapshot(spark, dir).version
      val byType = ManifestTable.changeFeedRows(spark, dir, 0, to)
        .groupBy(col("_change_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType == Map("insert" -> 100L,
        "update_preimage" -> 20L, "update_postimage" -> 20L))
    }
  }

  test("setCdcEnabled mid-life: commits before stay uncaptured, " +
      "commits after capture; the flag survives a checkpoint") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 100L).map(i => (i, i * 10)).toDF("k", "v"))
    ManifestTable.mergeCommit(spark, dir,
      cur => cur.filter($"k" =!= 1L)) // uncaptured era
    assert(captures(dir) == 0)
    assert(!ManifestTable.snapshot(spark, dir).cdcOn)
    ManifestTable.setCdcEnabled(spark, dir, on = true)
    assert(ManifestTable.snapshot(spark, dir).cdcOn)
    // idempotent: no new version for a no-op flip
    val v = ManifestTable.snapshot(spark, dir).version
    assert(ManifestTable.setCdcEnabled(spark, dir, on = true) == v)
    // the SQL door now captures (deleteWhere consults the table state)
    ManifestTable.writeCheckpoint(spark, dir, v, force = true)
    assert(ManifestTable.snapshot(spark, dir).cdcOn,
      "cdc_on must survive checkpoint resolution")
    cleanup(dir)
  }

  test("explicit Scala cdcLabels capture regardless of the table flag " +
      "(the call is the opt-in); clones inherit the flag") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 50L).map(i => (i, i)).toDF("k", "v"))
    ManifestTable.mergeCommit(spark, dir,
      cur => cur.filter($"k" < 40L),
      cdcLabels = Some(("delete", "insert")))
    assert(captures(dir) == 1, "explicit labels are an explicit opt-in")
    ManifestTable.setCdcEnabled(spark, dir, on = true)
    val dst = fresh()
    ManifestTable.cloneShallow(spark, dir, dst)
    assert(ManifestTable.snapshot(spark, dst).cdcOn,
      "clone inherits the capture policy")
    cleanup(dir); cleanup(dst)
  }
}
