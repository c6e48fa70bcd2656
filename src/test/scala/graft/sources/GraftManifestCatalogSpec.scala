package graft.sources

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL catalog path: CREATE TABLE / INSERT INTO / INSERT OVERWRITE
  * / SELECT with VERSION AS OF and TIMESTAMP AS OF / RENAME / DROP,
  * all through `spark.sql` against a registered TableCatalog — the
  * same commit log underneath, so SQL writers and Scala-API writers
  * share one concurrency story.
  */
class GraftManifestCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Register a fresh catalog name over a temp warehouse. */
  private def withCatalog(f: String => Unit): Unit = {
    val cat = s"g${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = java.nio.file.Files.createTempDirectory("graft-cat-").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try f(cat)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh))
    }
  }

  test("ALTER TABLE RENAME / DROP COLUMN: metadata-only commits, " +
      "reads exact under the new names, time travel shows old schemas") {
    withCatalog { cat =>
      import graft.operators.ManifestTable
      // cdc property: the tail of this test consumes the row-level
      // feed, and capture is opt-in per table (Delta's shape)
      spark.sql(s"CREATE TABLE $cat.r (k BIGINT, v BIGINT, note STRING)" +
        " TBLPROPERTIES ('cdc'='true')")
      spark.sql(s"INSERT INTO $cat.r " +
        "SELECT id, id * 2, concat('n', id) FROM range(100)")
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val dir = s"$wh/r"
      val filesBefore = ManifestTable.snapshot(spark, dir).paths.toSet
      spark.sql(s"ALTER TABLE $cat.r RENAME COLUMN v TO amount")
      // pure metadata: zero data files moved
      assert(ManifestTable.snapshot(spark, dir).paths.toSet == filesBefore)
      // reads under the NEW name are exact (old files, physical name v)
      assert(spark.sql(s"SELECT sum(amount) s FROM $cat.r")
        .first().getLong(0) == (0L until 100L).map(_ * 2).sum)
      // appends speak the new logical name; files keep physical 'v'
      spark.sql(s"INSERT INTO $cat.r " +
        "SELECT id + 100, (id + 100) * 2, concat('n', id + 100) " +
        "FROM range(20)")
      assert(spark.sql(s"SELECT sum(amount) s FROM $cat.r")
        .first().getLong(0) == (0L until 120L).map(_ * 2).sum)
      // time travel: the pre-rename version still shows 'v'
      val preRename = spark.sql(s"SELECT * FROM $cat.r VERSION AS OF 2")
      assert(preRename.columns.toSeq == Seq("k", "v", "note"))
      assert(preRename.agg(sum(col("v"))).first().getLong(0) ==
        (0L until 100L).map(_ * 2).sum)
      // DROP hides the column from now on, not from history
      spark.sql(s"ALTER TABLE $cat.r DROP COLUMN note")
      assert(spark.sql(s"SELECT * FROM $cat.r").columns.toSeq ==
        Seq("k", "amount"))
      assert(spark.sql(s"SELECT count(*) c FROM $cat.r")
        .first().getLong(0) == 120)
      assert(spark.sql(s"SELECT * FROM $cat.r VERSION AS OF 4")
        .columns.toSeq == Seq("k", "amount", "note"))
      // re-adding the dropped logical name binds a FRESH stored name:
      // the hidden data must not resurface
      spark.sql(s"ALTER TABLE $cat.r ADD COLUMN note STRING")
      assert(spark.sql(
        s"SELECT count(*) FILTER (WHERE note IS NOT NULL) c FROM $cat.r")
        .first().getLong(0) == 0)
      // filters and pruned projections work through the mapped scan
      assert(spark.sql(s"SELECT k FROM $cat.r WHERE amount >= 200")
        .count() == (0L until 120L).count(_ * 2 >= 200))
      // DELETE rewrites through the mapped write path
      spark.sql(s"DELETE FROM $cat.r WHERE k >= 110")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.r")
        .first().getLong(0) == 110)
      // UPDATE works on the mapped table: the replace-data write
      // stages files under the STORED names and reads back exact
      spark.sql(s"UPDATE $cat.r SET amount = amount + 7 WHERE k < 10")
      assert(spark.sql(s"SELECT CAST(sum(amount) AS BIGINT) s FROM " +
        s"$cat.r").first().getLong(0) ==
        (0L until 110L).map(_ * 2).sum + 70)
      assert(spark.sql(s"SELECT count(*) c FROM $cat.r")
        .first().getLong(0) == 110)
      // the rewritten files carry the PHYSICAL column name ('v'), so
      // every file of every era reads under one physical schema
      val lastFile = ManifestTable.snapshot(spark, dir).paths.last
      val raw = spark.read.parquet(lastFile)
      assert(raw.columns.contains("v") && !raw.columns.contains("amount"))
      // and the change feed captured the update's exact images
      val to = ManifestTable.snapshot(spark, dir).version
      val feed = ManifestTable.changeFeedRows(spark, dir, to - 1, to)
      assert(feed.filter(col("_change_type") === "update_postimage")
        .count() == 10)
    }
  }

  test("CHECK constraints: validated on add, enforced atomically on " +
      "every write door, dropped on demand, reset by overwrite") {
    withCatalog { cat =>
      import graft.operators.ManifestTable
      spark.sql(s"CREATE TABLE $cat.k (k BIGINT, cents BIGINT)")
      spark.sql(s"INSERT INTO $cat.k SELECT id, id * 10 FROM range(50)")
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val dir = s"$wh/k"
      spark.sql(s"ALTER TABLE $cat.k ADD CONSTRAINT nonneg " +
        "CHECK (cents >= 0)")
      assert(ManifestTable.snapshot(spark, dir).checks ==
        Map("nonneg" -> "cents >= 0"))
      // a constraint existing rows violate is refused
      val e1 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.k ADD CONSTRAINT impossible " +
          "CHECK (cents > 100)")
      }
      assert(e1.getMessage.contains("existing rows"))
      // good writes land; violating writes are rejected ATOMICALLY
      spark.sql(s"INSERT INTO $cat.k SELECT id + 50, (id + 50) * 10 " +
        "FROM range(10)")
      val e2 = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.k VALUES (900, 5), (901, -1)")
      }
      assert(e2.getMessage.contains("nonneg"))
      assert(spark.sql(s"SELECT count(*) c FROM $cat.k")
        .first().getLong(0) == 60) // not even the valid row of the batch
      // NULL predicate PASSES (SQL standard CHECK semantics)
      spark.sql(s"INSERT INTO $cat.k VALUES (902, NULL)")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.k")
        .first().getLong(0) == 61)
      // the Scala door enforces the same log-carried constraint
      import spark.implicits._
      val e3 = intercept[Exception] {
        ManifestTable.append(spark, dir,
          Seq((903L, -5L)).toDF("k", "cents"))
      }
      assert(e3.getMessage.contains("nonneg"))
      // UPDATE through row-level ops is validated too
      val e4 = intercept[Exception] {
        spark.sql(s"UPDATE $cat.k SET cents = -cents WHERE k < 3 AND cents > 0")
      }
      assert(e4.getMessage != null)
      assert(spark.sql(s"SELECT count(*) FILTER (WHERE cents < 0) c " +
        s"FROM $cat.k").first().getLong(0) == 0)
      // renaming a constrained column is refused while the check lives
      val e5 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.k RENAME COLUMN cents TO pennies")
      }
      assert(e5.getMessage.contains("nonneg"))
      // DROP CONSTRAINT re-opens the door
      spark.sql(s"ALTER TABLE $cat.k DROP CONSTRAINT nonneg")
      spark.sql(s"INSERT INTO $cat.k VALUES (904, -1)")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.k")
        .first().getLong(0) == 62)
    }
  }

  test("column mapping survives a checkpoint: rename, force the fold, " +
      "resolve from the checkpoint alone") {
    withCatalog { cat =>
      import graft.operators.ManifestTable
      spark.sql(s"CREATE TABLE $cat.c (a BIGINT, b BIGINT)")
      spark.sql(s"INSERT INTO $cat.c SELECT id, id * 3 FROM range(50)")
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      val dir = s"$wh/c"
      spark.sql(s"ALTER TABLE $cat.c RENAME COLUMN b TO triple")
      val v = ManifestTable.snapshot(spark, dir).version
      ManifestTable.writeCheckpoint(spark, dir, v, force = true)
      assert(ManifestTable.checkpointVersions(spark, dir).contains(v))
      spark.sql(s"INSERT INTO $cat.c SELECT id + 50, (id + 50) * 3 " +
        "FROM range(10)")
      // the resolve of the tail rides the checkpoint's col_map row
      val snap = ManifestTable.snapshot(spark, dir)
      assert(snap.colMap == Map("a" -> "a", "triple" -> "b"))
      assert(spark.sql(s"SELECT sum(triple) s FROM $cat.c")
        .first().getLong(0) == (0L until 60L).map(_ * 3).sum)
    }
  }

  test("CREATE / INSERT INTO / VERSION AS OF / INSERT OVERWRITE / DROP") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
      // v1 = empty table, schema from the log
      assert(spark.sql(s"SELECT * FROM $cat.t").count() == 0)
      assert(spark.sql(s"SELECT * FROM $cat.t").columns.toSeq ==
        Seq("k", "v"))
      spark.sql(s"INSERT INTO $cat.t SELECT id, id * 2 FROM range(100)")
      spark.sql(s"INSERT INTO $cat.t " +
        "SELECT id + 100, (id + 100) * 2 FROM range(50)")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.t")
        .first().getLong(0) == 150)
      assert(spark.sql(s"SELECT sum(v) s FROM $cat.t")
        .first().getLong(0) == (0L until 150L).map(_ * 2).sum)
      // time travel: v1 empty, v2 first insert, v3 both
      assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1")
        .count() == 0)
      assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2")
        .count() == 100)
      // overwrite resets content (and is just another version)
      spark.sql(s"INSERT OVERWRITE $cat.t SELECT id, id FROM range(7)")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.t")
        .first().getLong(0) == 7)
      assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 3")
        .count() == 150)
      spark.sql(s"DROP TABLE $cat.t")
      assert(!spark.catalog.tableExists(s"$cat.t"))
    }
  }

  test("TIMESTAMP AS OF resolves by publish time through SQL") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.ts_t (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.ts_t SELECT id FROM range(10)")
      Thread.sleep(1100)
      val between = java.sql.Timestamp
        .from(java.time.Instant.now()).toString.stripSuffix(".0")
      Thread.sleep(1100)
      spark.sql(s"INSERT INTO $cat.ts_t SELECT id FROM range(20)")
      assert(spark.sql(
        s"SELECT * FROM $cat.ts_t TIMESTAMP AS OF '$between'")
        .count() == 10)
      assert(spark.sql(s"SELECT * FROM $cat.ts_t").count() == 30)
    }
  }

  test("SQL reads keep manifest-stats pruning and parquet pushdown") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.pr (k BIGINT) " +
        "TBLPROPERTIES ('stats_col' = 'k')")
      // three disjoint ranges = range-tight file stats
      spark.sql(s"INSERT INTO $cat.pr SELECT id FROM range(0, 100)")
      spark.sql(s"INSERT INTO $cat.pr SELECT id FROM range(100, 200)")
      spark.sql(s"INSERT INTO $cat.pr SELECT id FROM range(200, 300)")
      val mid = spark.sql(
        s"SELECT * FROM $cat.pr WHERE k >= 120 AND k <= 180")
      assert(mid.count() == 61)
      val explained = mid.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(explained.contains("PushedFilters") &&
        explained.contains("GreaterThanOrEqual(k,120)"),
        s"pushdown missing through SQL:\n$explained")
    }
  }

  test("namespaces: CREATE NAMESPACE / qualified tables / SHOW / RENAME") {
    withCatalog { cat =>
      spark.sql(s"CREATE NAMESPACE $cat.ns1")
      spark.sql(s"CREATE TABLE $cat.ns1.a (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.ns1.a SELECT id FROM range(5)")
      assert(spark.sql(s"SHOW TABLES IN $cat.ns1").collect()
        .map(_.getString(1)).toSeq == Seq("a"))
      // RENAME TO takes a catalog-less multipart target
      spark.sql(s"ALTER TABLE $cat.ns1.a RENAME TO ns1.b")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.ns1.b")
        .first().getLong(0) == 5)
      assert(!spark.catalog.tableExists(s"$cat.ns1.a"))
    }
  }

  test("DELETE FROM: COW rewrite, pre-delete version is the undo log, " +
      "NULLs survive a negated predicate") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.d (k BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.d " +
        "SELECT id, CASE WHEN id % 10 = 0 THEN NULL ELSE id END " +
        "FROM range(100)")
      spark.sql(s"DELETE FROM $cat.d WHERE v >= 50")
      val got = spark.sql(s"SELECT count(*) c FROM $cat.d").first().getLong(0)
      // survivors: v < 50 (45 rows: ids 1..49 minus the 4 null-v ids
      // 10,20,30,40... wait ids 0..49 have 5 nulls at 0,10,20,30,40)
      // v NULL rows do NOT match v >= 50, so they SURVIVE: ids with
      // v<50 = 1..49 excl nulls (45) + null-v ids (10) = 55
      assert(got == 55, s"DELETE semantics over NULLs wrong: $got")
      // pre-delete time travel intact
      assert(spark.sql(s"SELECT * FROM $cat.d VERSION AS OF 2")
        .count() == 100)
      // an untranslatable predicate (no v1 Filter for k % 2) routes
      // through the ROW-LEVEL rewrite (SupportsRowLevelOperations →
      // COW replace-data) instead of failing analysis: survivors are
      // the odd ids (the 10 null-v ids 0,10,…,90 are all even)
      spark.sql(s"DELETE FROM $cat.d WHERE k % 2 = 0")
      assert(spark.sql(s"SELECT count(*) c FROM $cat.d")
        .first().getLong(0) == 25)
      assert(spark.sql(s"SELECT min(k) m FROM $cat.d")
        .first().getLong(0) == 1)
    }
  }

  test("ALTER TABLE ADD COLUMN: a schema-only commit; old rows " +
      "null-fill, time travel shows the pre-ALTER schema") {
    withCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.a (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.a SELECT id FROM range(10)")
      spark.sql(s"ALTER TABLE $cat.a ADD COLUMN tag STRING")
      spark.sql(s"INSERT INTO $cat.a SELECT id, 'new' FROM range(5)")
      val got = spark.sql(s"SELECT * FROM $cat.a")
      assert(got.columns.toSeq == Seq("k", "tag"))
      assert(got.count() == 15 &&
        got.filter("tag IS NULL").count() == 10)
      assert(spark.sql(s"SELECT * FROM $cat.a VERSION AS OF 2")
        .columns.toSeq == Seq("k"))
      // DROP now works through column mapping (metadata-only); type
      // changes stay refused — the log never coerces
      spark.sql(s"ALTER TABLE $cat.a DROP COLUMN tag")
      assert(spark.sql(s"SELECT * FROM $cat.a").columns.toSeq == Seq("k"))
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.a ALTER COLUMN k TYPE INT")
      }
    }
  }

  test("SQL writers and Scala-API writers share the commit log") {
    withCatalog { cat =>
      import graft.operators.ManifestTable
      spark.sql(s"CREATE TABLE $cat.shared (k BIGINT)")
      spark.sql(s"INSERT INTO $cat.shared SELECT id FROM range(10)")
      // the Scala API appends to the SAME table directory
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      import spark.implicits._
      ManifestTable.append(spark, s"$wh/shared",
        (100L until 105L).toDF("k"))
      assert(spark.sql(s"SELECT count(*) c FROM $cat.shared")
        .first().getLong(0) == 15)
      // and SQL time travel sees the Scala commit as a version
      assert(ManifestTable.versions(spark, s"$wh/shared") ==
        Vector(1, 2, 3))
    }
  }
}
