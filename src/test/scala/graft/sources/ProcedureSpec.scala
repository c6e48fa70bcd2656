package graft.sources

import graft.streaming.TestSpark
import graft.operators.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL `CALL` maintenance procedures over the manifest catalog:
  * optimize / zorder / vacuum / restore / purge_dvs. */
class ProcedureSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withCatalog(body: (String, String) => Unit): Unit = {
    val cat = s"gproc_${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = java.nio.file.Files
      .createTempDirectory("graft-proc-").toString
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

  test("CALL optimize compacts small files and reports the swap") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
      (0 until 5).foreach(i =>
        spark.sql(s"INSERT INTO $cat.t SELECT id + ${i * 100} " +
          "FROM range(100)"))
      val before = ManifestTable.snapshot(spark, s"$wh/t").entries.size
      val r = spark.sql(s"CALL $cat.optimize(tbl => 't')").first()
      assert(r.getLong(1) == before)
      assert(r.getLong(2) < r.getLong(1))
      assert(spark.sql(s"SELECT count(*) c FROM $cat.t")
        .first().getLong(0) == 500)
    }
  }

  test("CALL zorder clusters and both dimensions prune afterwards") {
    withCatalog { (cat, wh) =>
      import spark.implicits._
      (0 until 4096).map(i => (i.toLong, (i / 64).toLong, (i % 64).toLong))
        .toDF("id", "x", "y").createOrReplaceTempView(s"${cat}_g")
      spark.sql(s"CREATE TABLE $cat.z (id BIGINT, x BIGINT, y BIGINT)")
      spark.sql(s"INSERT INTO $cat.z SELECT * FROM ${cat}_g")
      val r = spark.sql(
        s"CALL $cat.zorder(tbl => 'z', col1 => 'x', col2 => 'y', " +
          "target_files => 16)").first()
      assert(r.getLong(1) == 16)
      val snap = ManifestTable.snapshot(spark, s"$wh/z")
      assert(snap.entries.forall(e =>
        e.stats.contains("x") && e.stats.contains("y")))
      assert(spark.sql(s"SELECT count(*) c FROM $cat.z WHERE " +
        "x BETWEEN 10 AND 13").first().getLong(0) == 4 * 64)
      spark.catalog.dropTempView(s"${cat}_g")
    }
  }

  test("CALL restore + CALL vacuum: undo then retention") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.r (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.r SELECT id FROM range(50)")
      spark.sql(s"INSERT OVERWRITE $cat.r SELECT id FROM range(5)")
      val r = spark.sql(s"CALL $cat.restore(tbl => 'r', version => 2)")
        .first()
      assert(r.getInt(1) == 4)
      assert(spark.sql(s"SELECT count(*) c FROM $cat.r")
        .first().getLong(0) == 50)
      val v = spark.sql(s"CALL $cat.vacuum(tbl => 'r', keep => 1)")
        .first()
      assert(v.getInt(0) == 4 && v.getInt(1) == 4)
      assert(spark.sql(s"SELECT count(*) c FROM $cat.r")
        .first().getLong(0) == 50)
    }
  }

  test("CALL history returns the commit log, one row per version") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.h (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.h SELECT id FROM range(30)")
      spark.sql(s"INSERT INTO $cat.h SELECT id FROM range(30, 50)")
      val rows = spark.sql(s"CALL $cat.history(tbl => 'h')")
        .orderBy(col("version")).collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
      assert(rows.map(_.getLong(3)).toSeq == Seq(0L, 30L, 20L))
      assert(rows.forall(_.getBoolean(5))) // all data_change
    }
  }

  test("CALL purge_dvs materializes a MOR delete; SQL reads are exact " +
      "both before (merge-on-read scan) and after (bare scan)") {
    withCatalog { (cat, wh) =>
      import spark.implicits._
      spark.sql(s"CREATE TABLE $cat.d (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.d SELECT id FROM range(100)")
      ManifestTable.deleteRowsMor(spark, s"$wh/d", col("k") % 4 === 1)
      // the DV-aware scan (x56): SELECT works pre-purge, merge-on-read
      assert(spark.sql(s"SELECT count(*) c FROM $cat.d")
        .first().getLong(0) == 75)
      val r = spark.sql(s"CALL $cat.purge_dvs(tbl => 'd')").first()
      assert(r.getLong(1) == 75)
      assert(ManifestTable.snapshot(spark, s"$wh/d")
        .entries.forall(_.dv.isEmpty))
      assert(spark.sql(s"SELECT count(*) c FROM $cat.d")
        .first().getLong(0) == 75)
    }
  }
}
