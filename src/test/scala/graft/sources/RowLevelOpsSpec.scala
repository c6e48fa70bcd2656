package graft.sources

import graft.streaming.TestSpark
import graft.operators.ManifestTable
import org.scalatest.funsuite.AnyFunSuite

/** SQL UPDATE / MERGE INTO / rewritten DELETE through DSv2 row-level
  * operations: Spark plans the replacement rows, executors write them
  * through the native parquet path, and the manifest log swaps pinned
  * files for staged ones in one atomic commit. */
class RowLevelOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withCatalog(body: String => Unit): Unit = {
    val cat = s"grlo_${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = java.nio.file.Files
      .createTempDirectory("graft-rlo-").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(cat)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(wh))
    }
  }

  test("UPDATE: matched rows change, unmatched survive verbatim, the " +
      "pre-update version is the undo log") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.u (k BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.u SELECT id, id * 10 FROM range(100)")
      spark.sql(s"UPDATE $cat.u SET v = v + 1 WHERE k >= 90")
      val got = spark.sql(
        s"SELECT CAST(sum(v) AS BIGINT) s, count(*) c FROM $cat.u").first()
      assert(got.getLong(1) == 100)
      assert(got.getLong(0) == (0 until 100).map(_ * 10L).sum + 10)
      // undo log intact
      assert(spark.sql(
        s"SELECT CAST(sum(v) AS BIGINT) s FROM $cat.u VERSION AS OF 2")
        .first().getLong(0) == (0 until 100).map(_ * 10L).sum)
      // an expression predicate no v1 Filter can carry works too
      // (sentinel -5: v = 0 already exists at k = 0)
      spark.sql(s"UPDATE $cat.u SET v = -5 WHERE k % 7 = 3")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.u WHERE v = -5")
        .first().getLong(0) == (0 until 100).count(_ % 7 == 3))
    }
  }

  test("UPDATE over a merge-on-read table: the COW scan applies the " +
      "deletion vectors, deleted rows stay deleted, DVs retire") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.m (k BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.m SELECT id, id * 10 FROM range(200)")
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val dir = s"$wh/m"
      val (_, nDel) = ManifestTable.deleteRowsMor(spark, dir,
        org.apache.spark.sql.functions.col("k") % 4 === 1) // 50 rows
      assert(nDel == 50)
      // SELECT through SQL sees merge-on-read
      assert(spark.sql(s"SELECT count(*) c FROM $cat.m")
        .first().getLong(0) == 150)
      // UPDATE rewrites the pinned (dv-carrying) files from LIVE rows
      spark.sql(s"UPDATE $cat.m SET v = -1 WHERE k % 4 = 2")
      val r = spark.sql(s"SELECT count(*) c, " +
        s"count(*) FILTER (WHERE v = -1) u, " +
        s"count(*) FILTER (WHERE k % 4 = 1) res FROM $cat.m").first()
      assert(r.getLong(0) == 150) // MOR deletes NOT resurrected
      assert(r.getLong(1) == 50)  // updates applied
      assert(r.getLong(2) == 0)   // deleted slice still gone
      // the rewrite retired the vectors: the snapshot is clean again
      assert(ManifestTable.snapshot(spark, dir)
        .entries.forall(_.dv.isEmpty))
      // and values that were neither deleted nor updated are verbatim
      assert(spark.sql(s"SELECT CAST(sum(v) AS BIGINT) s FROM $cat.m " +
        "WHERE k % 4 IN (0, 3)").first().getLong(0) ==
        (0 until 200).filter(i => i % 4 == 0 || i % 4 == 3)
          .map(_ * 10L).sum)
    }
  }

  test("write-time CDC: the feed across COW UPDATE / DELETE carries " +
      "exact pre/post images and reconstructs the live table") {
    import org.apache.spark.sql.functions._
    withCatalog { cat =>
      // capture is OPT-IN per table (Delta's enableChangeDataFeed)
      spark.sql(s"CREATE TABLE $cat.c (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('cdc'='true')")
      spark.sql(s"INSERT INTO $cat.c SELECT id, id * 10 FROM range(100)")
      spark.sql(s"UPDATE $cat.c SET v = v + 1 WHERE k % 5 = 0") // 20 rows
      spark.sql(s"DELETE FROM $cat.c WHERE k >= 90")            // 10 rows
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val dir = s"$wh/c"
      val to = ManifestTable.snapshot(spark, dir).version
      val feed = ManifestTable.changeFeedRows(spark, dir, 0, to)
      val byType = feed.groupBy(col("_change_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // UPDATE: exact 20 pre + 20 post images, never whole-file
      // re-inserts; DELETE: exactly the 10 doomed rows
      assert(byType == Map("insert" -> 100L, "update_preimage" -> 20L,
        "update_postimage" -> 20L, "delete" -> 10L))
      // post-images carry the UPDATED values, pre-images the originals
      assert(feed.filter(col("_change_type") === "update_postimage")
        .agg(sum(col("v"))).first().getLong(0) ==
        (0 until 100 by 5).map(_ * 10L + 1).sum)
      assert(feed.filter(col("_change_type") === "update_preimage")
        .agg(sum(col("v"))).first().getLong(0) ==
        (0 until 100 by 5).map(_ * 10L).sum)
      // consumer proof: + inserts/postimages − deletes/preimages
      // reconstructs the live table as a multiset
      val applied = feed.groupBy(col("k"), col("v"))
        .agg(sum(when(col("_change_type").isin("insert",
          "update_postimage"), 1).otherwise(-1)).as("alive"))
        .filter(col("alive") === 1)
      val live = ManifestTable.read(spark, dir)
      assert(applied.count() == live.count())
      assert(applied.agg(sum(col("v"))).first().getLong(0) ==
        live.agg(sum(col("v"))).first().getLong(0))
      // vacuum keeps referenced captures, sweeps orphans with the log
      val f = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cdcRoot = new org.apache.hadoop.fs.Path(dir, "_change_data")
      assert(f.listStatus(cdcRoot).length == 2)
      // keep=1 keeps the DELETE's delta (its capture stays readable);
      // the UPDATE's delta is dropped and its capture swept with it
      ManifestTable.vacuum(spark, dir, keep = 1)
      assert(f.listStatus(cdcRoot).length == 1)
    }
  }

  test("UPDATE SET with NULL-condition rows: three-valued logic keeps " +
      "them unchanged") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.n (k BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.n SELECT id, " +
        "CASE WHEN id % 10 = 0 THEN NULL ELSE id END FROM range(50)")
      spark.sql(s"UPDATE $cat.n SET v = -1 WHERE v >= 25")
      val r = spark.sql(s"SELECT count(*) FILTER (WHERE v = -1) a, " +
        s"count(*) FILTER (WHERE v IS NULL) b FROM $cat.n").first()
      assert(r.getLong(0) == (25 until 50).count(_ % 10 != 0))
      assert(r.getLong(1) == 5) // NULL rows did not match, stayed NULL
    }
  }

  test("MERGE INTO: matched update + matched delete + not-matched " +
      "insert in one statement") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(10)")
      spark.sql(
        s"""MERGE INTO $cat.t t USING (
           |  SELECT id AS k, id * 100 AS nv,
           |    CASE WHEN id % 3 = 0 THEN 'D' ELSE 'U' END AS act
           |  FROM range(5, 15)
           |) s ON t.k = s.k
           |WHEN MATCHED AND s.act = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
           |""".stripMargin)
      val rows = spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expect = (
        // untouched: k < 5
        (0L until 5L).map(k => (k, k)) ++
        // matched 5..9: k%3==0 deleted (6, 9), others updated
        Seq(5L, 7L, 8L).map(k => (k, k * 100)) ++
        // not matched 10..14: inserted
        (10L until 15L).map(k => (k, k * 100))
      ).sorted
      assert(rows == expect)
      // undo intact
      assert(spark.sql(s"SELECT count(*) c FROM $cat.t VERSION AS OF 2")
        .first().getLong(0) == 10)
    }
  }

  test("UPDATE on a PARTITIONED table keeps the layout: tuples stay " +
      "in the log and pruning stays exact") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.p (k BIGINT, grp STRING, v BIGINT) " +
        "PARTITIONED BY (grp)")
      spark.sql(s"INSERT INTO $cat.p SELECT id, " +
        "concat('g', CAST(id % 3 AS STRING)), id FROM range(90)")
      spark.sql(s"UPDATE $cat.p SET v = v * 2 WHERE grp = 'g1'")
      val dir = spark.conf.get(s"spark.sql.catalog.$cat.warehouse") + "/p"
      val snap = ManifestTable.snapshot(spark, dir)
      assert(snap.partCols == Seq("grp"))
      assert(snap.entries.nonEmpty)
      assert(snap.entries.forall(_.part.contains("grp")))
      val r = spark.sql(s"SELECT CAST(sum(v) AS BIGINT) s FROM $cat.p " +
        "WHERE grp = 'g1'").first()
      assert(r.getLong(0) == (0 until 90).filter(_ % 3 == 1).map(_ * 2L).sum)
      assert(spark.sql(s"SELECT count(*) c FROM $cat.p").first()
        .getLong(0) == 90)
    }
  }

  test("DELETE of every row through the rewrite leaves an empty table " +
      "with its schema; DELETE of nothing is a no-op version") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.e (k BIGINT, s STRING)")
      spark.sql(s"INSERT INTO $cat.e SELECT id, CAST(id AS STRING) " +
        "FROM range(20)")
      // length() has no v1 Filter: forced through the rewrite
      spark.sql(s"DELETE FROM $cat.e WHERE length(s) >= 1")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.e").first()
        .getLong(0) == 0)
      assert(spark.sql(s"SELECT * FROM $cat.e").columns.toSeq ==
        Seq("k", "s"))
      // still writable after the empty state
      spark.sql(s"INSERT INTO $cat.e VALUES (99, 'x')")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.e").first()
        .getLong(0) == 1)
    }
  }
}
