package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read DELETE via deletion vectors: marking rows deleted
  * costs O(deleted rows) in bytes written, readers apply the vectors
  * as one broadcast anti-join, purge materializes, vacuum sweeps
  * superseded vectors. */
class DeletionVectorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-dv-").toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  test("MOR delete: no data file rewritten, reads exact, O(deleted) " +
      "bytes, undo via time travel") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 1000L).map(i => (i, i % 10)).toDF("k", "m")
        .repartition(4))
    val before = ManifestTable.snapshot(spark, dir)
    val (v, n) = ManifestTable.deleteRowsMor(spark, dir, col("m") === 3)
    assert(n == 100)
    val after = ManifestTable.snapshot(spark, dir)
    // same physical files, re-pointed with DVs
    assert(after.paths.toSet == before.paths.toSet)
    assert(after.entries.forall(_.dv.isDefined))
    assert(after.entries.map(_.dvRows).sum == 100)
    assert(after.entries.map(_.liveRows).sum == 900)
    // reads apply the vectors
    val got = ManifestTable.read(spark, dir)
    assert(got.count() == 900)
    assert(got.filter(col("m") === 3).count() == 0)
    assert(got.agg(sum(col("k"))).first().getLong(0) ==
      (0L until 1000L).filter(_ % 10 != 3).sum)
    // time travel to the pre-delete version sees everything
    assert(ManifestTable.read(spark, dir, Some(before.version))
      .count() == 1000)
    assert(v == before.version + 1)
    cleanup(dir)
  }

  test("a second MOR delete unions positions; NULL-predicate rows " +
      "survive") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 100L).map(i =>
        (i, if (i % 10 == 0) None else Some(i))).toDF("k", "v")
        .repartition(2))
    ManifestTable.deleteRowsMor(spark, dir, col("v") >= 50)
    // survivors: v < 50 non-null (45 minus 5 nulls in 0..49 → 44+1? )
    // ids 0..49: nulls at 0,10,20,30,40 (5); non-null 45. Plus the 10
    // null rows across 0..99 all survive (NULL predicate).
    assert(ManifestTable.read(spark, dir).count() == 45 + 10)
    val (_, n2) = ManifestTable.deleteRowsMor(spark, dir,
      col("k") % 2 === 1)
    // odd survivors among (non-null v<50 ∪ nulls): odds 1..49 non-null
    // = 25; null ids are even → none
    assert(n2 == 25)
    assert(ManifestTable.read(spark, dir).count() == 30)
    assert(ManifestTable.read(spark, dir)
      .filter(col("v").isNull).count() == 10)
    cleanup(dir)
  }

  test("purgeDvs materializes: content identical, DVs gone, the DSv2 " +
      "front door reads merge-on-read before and bare after") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 500L).map(i => (i, i % 7)).toDF("k", "m")
        .repartition(3))
    ManifestTable.deleteRowsMor(spark, dir, col("m") === 2)
    val wantSum = ManifestTable.read(spark, dir)
      .agg(sum(col("k"))).first().getLong(0)
    // front door applies the vectors merge-on-read (x56): same counts
    // and totals as the Scala read, no purge needed to SELECT
    val door = spark.read.format("graft-manifest").load(dir)
    assert(door.count() == 500 - 72)
    assert(door.agg(sum(col("k"))).first().getLong(0) == wantSum)
    assert(door.filter(col("m") === 2).count() == 0)
    ManifestTable.purgeDvs(spark, dir)
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.entries.forall(_.dv.isEmpty))
    val through = spark.read.format("graft-manifest").load(dir)
    assert(through.count() == 500 - 72) // m==2: ids 2,9,…,499 → 72
    assert(through.agg(sum(col("k"))).first().getLong(0) == wantSum)
    // the purge is dataChange=false: the change feed never saw it
    val feed = ManifestTable.changedEntries(spark, dir, 0, snap.version)
    assert(feed.map(_.rows).sum == 500)
    cleanup(dir)
  }

  test("compaction leaves DV files alone; vacuum sweeps superseded " +
      "vectors and keeps referenced ones") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 400L).map(i => (i, i % 4)).toDF("k", "m")
        .repartition(5))
    ManifestTable.deleteRowsMor(spark, dir, col("m") === 0)
    ManifestTable.deleteRowsMor(spark, dir, col("m") === 1)
    // second DV supersedes the first (every affected file re-pointed)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvRoot = new org.apache.hadoop.fs.Path(dir, "_dvs")
    assert(f.listStatus(dvRoot).length == 2)
    // keep only the latest version: the first DV dir is unreachable
    ManifestTable.vacuum(spark, dir, keep = 1)
    assert(f.listStatus(dvRoot).length == 1)
    val got = ManifestTable.read(spark, dir)
    assert(got.count() == 200)
    assert(got.filter(col("m") <= 1).count() == 0)
    cleanup(dir)
  }

  test("changeFeedRows: inserts and MOR deletes with exact rows; " +
      "maintenance invisible; a second delete feeds only its diff") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 100L).map(i => (i, i % 10)).toDF("k", "m")
        .repartition(2))
    ManifestTable.deleteRowsMor(spark, dir, col("m") === 3) // 10 rows
    ManifestTable.append(spark, dir,
      (100L until 150L).map(i => (i, i % 10)).toDF("k", "m"))
    ManifestTable.deleteRowsMor(spark, dir, col("m") === 7) // 15 rows
    ManifestTable.purgeDvs(spark, dir) // must NOT appear in the feed
    val to = ManifestTable.snapshot(spark, dir).version
    val feed = ManifestTable.changeFeedRows(spark, dir, 0, to)
    val byType = feed.groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 150L, "delete" -> 25L))
    // the SECOND delete's version feeds exactly its own 15 rows (the
    // m==3 positions folded into its DV must not re-emit)
    val second = feed.filter(col("_change_type") === "delete")
      .groupBy(col("_commit_version")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(second.values.toSeq.sorted == Seq(10L, 15L))
    // exact deleted rows
    val deleted = feed.filter(col("_change_type") === "delete")
      .select(col("k")).collect().map(_.getLong(0)).sorted.toVector
    assert(deleted == (0L until 150L)
      .filter(i => i % 10 == 3 || i % 10 == 7)
      .filterNot(i => i >= 100 && i % 10 == 3).toVector)
    cleanup(dir)
  }

  test("front door on a MIXED snapshot: dirty files merge-on-read, " +
      "clean files untouched, filters and aggregates exact") {
    import spark.implicits._
    val dir = fresh()
    // first commit's files become dirty; the appended ones stay clean
    ManifestTable.create(spark, dir,
      (0L until 400L).map(i => (i, i % 8)).toDF("k", "m").repartition(2))
    ManifestTable.append(spark, dir,
      (400L until 1000L).map(i => (i, i % 8)).toDF("k", "m")
        .repartition(3))
    ManifestTable.deleteRowsMor(spark, dir, col("k") < 400 && col("m") === 5)
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.entries.count(_.dv.isDefined) == 2)
    assert(snap.entries.count(_.dv.isEmpty) == 3)
    val door = spark.read.format("graft-manifest").load(dir)
    val mor = ManifestTable.read(spark, dir)
    assert(door.count() == mor.count())
    assert(door.agg(sum(col("k"))).first().getLong(0) ==
      mor.agg(sum(col("k"))).first().getLong(0))
    // a filter over both sides stays exact (dirty files take it as a
    // residual above the scan, never inside the position counter)
    assert(door.filter(col("m") === 5).count() ==
      (400L until 1000L).count(_ % 8 == 5))
    assert(door.filter(col("m") === 5 && col("k") < 400).count() == 0)
    // a second delete composes through the door as well
    ManifestTable.deleteRowsMor(spark, dir, col("m") === 0)
    assert(spark.read.format("graft-manifest").load(dir).count() ==
      (0L until 1000L).count(i =>
        i % 8 != 0 && !(i < 400 && i % 8 == 5)))
    cleanup(dir)
  }

  test("deletion vectors survive table relocation: rename the table " +
      "directory, reads/feed/purge still apply the vectors") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 600L).map(i => (i, i % 6)).toDF("k", "m")
        .repartition(3))
    ManifestTable.deleteRowsMor(spark, dir, col("m") === 4) // 100 rows
    // relocate the whole table — the manifest contract says tables are
    // relocatable (paths are table-relative), and DV keys must be too
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val moved = dir + "_moved"
    assert(f.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(moved)))
    val got = ManifestTable.read(spark, moved)
    assert(got.count() == 500)
    assert(got.filter(col("m") === 4).count() == 0)
    // the row-level change feed resolves the moved DVs too
    val to = ManifestTable.snapshot(spark, moved).version
    val feed = ManifestTable.changeFeedRows(spark, moved, 1, to)
    assert(feed.filter(col("_change_type") === "delete").count() == 100)
    // a second MOR delete AT THE NEW LOCATION composes with the moved DV
    ManifestTable.deleteRowsMor(spark, moved, col("m") === 5)
    assert(ManifestTable.read(spark, moved).count() == 400)
    // purge still sees the right live set (its row-count guard would
    // fail loudly if the moved DV stopped matching)
    ManifestTable.purgeDvs(spark, moved)
    assert(ManifestTable.read(spark, moved).count() == 400)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(moved).getParentFile)
  }

  test("concurrent MOR deletes on the same file: no deletion is ever " +
      "silently resurrected (loser aborts as a write conflict)") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 1000L).map(i => (i, i % 10)).toDF("k", "m")
        .coalesce(1)) // ONE file: any two deletes re-point the same path
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    def attempt(cond: org.apache.spark.sql.Column)
        : scala.concurrent.Future[Either[Throwable, Long]] =
      scala.concurrent.Future {
        try Right(ManifestTable.deleteRowsMor(spark, dir, cond)._2)
        catch { case e: Throwable => Left(e) }
      }
    val fa = attempt(col("m") === 1)
    val fb = attempt(col("m") === 2)
    val ra = scala.concurrent.Await.result(fa,
      scala.concurrent.duration.Duration(120, "s"))
    val rb = scala.concurrent.Await.result(fb,
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    // every delete that REPORTED success must hold in the final table;
    // a loser must fail loudly (write conflict), never drop positions
    val live = ManifestTable.read(spark, dir)
    def deletedOk(r: Either[Throwable, Long], m: Int): Long = r match {
      case Right(n) =>
        assert(n == 100, s"m=$m reported $n deletions")
        assert(live.filter(col("m") === m).count() == 0,
          s"m=$m reported success but rows survive — resurrected!")
        100L
      case Left(e) =>
        assert(e.getMessage != null &&
          e.getMessage.contains("write conflict"),
          s"loser failed with the wrong error: $e")
        assert(live.filter(col("m") === m).count() == 100,
          s"m=$m aborted but its rows are gone")
        0L
    }
    val gone = deletedOk(ra, 1) + deletedOk(rb, 2)
    assert(live.count() == 1000 - gone)
    cleanup(dir)
  }

  test("MOR delete on a partitioned table keeps tuples; checkpointed " +
      "snapshots round-trip the DV pointers") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("k", "g"),
      partitionBy = Seq("g"))
    ManifestTable.deleteRowsMor(spark, dir, col("k") % 5 === 0)
    val v = ManifestTable.snapshot(spark, dir).version
    ManifestTable.writeCheckpoint(spark, dir, v)
    assert(ManifestTable.checkpointVersions(spark, dir).contains(v))
    ManifestTable.append(spark, dir,
      (1000L until 1010L).map(i => (i, "g0")).toDF("k", "g"))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.partCols == Seq("g"))
    val dirty = snap.entries.filter(_.dv.isDefined)
    assert(dirty.nonEmpty && dirty.forall(_.part.contains("g")))
    assert(ManifestTable.read(spark, dir).count() == 300 - 60 + 10)
    cleanup(dir)
  }

  test("column mapping and MOR deletes coexist: MOR delete, RENAME " +
      "COLUMN, then read/DML/feed/purge are all exact") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 400L).map(i => (i, i * 7)).toDF("k", "v"))
    // MOR delete first, then a mapping rename on the dirty snapshot
    ManifestTable.deleteRowsMor(spark, dir, col("k") % 4 === 0)
    ManifestTable.renameColumn(spark, dir, "v", "val")
    assert(ManifestTable.snapshot(spark, dir).mapped)
    // Scala read: logical names, vectors applied
    val r1 = ManifestTable.read(spark, dir)
    assert(r1.columns.toSeq == Seq("k", "val"))
    assert(r1.count() == 300)
    assert(r1.agg(sum(col("val"))).first().getLong(0) ==
      (0L until 400L).filter(_ % 4 != 0).map(_ * 7).sum)
    // DSv2 front door: merge-on-read scan under the mapped names
    val fd = spark.read.format("graft-manifest").load(dir)
      .filter(col("k") < 100)
    assert(fd.columns.toSeq == Seq("k", "val"))
    assert(fd.count() == 75)
    // a SECOND MOR delete on the now-mapped table (the reverse order)
    val (_, d2) = ManifestTable.deleteRowsMor(spark, dir,
      col("val") > 7L * 390)
    assert(d2 == (391L until 400L).count(_ % 4 != 0))
    assert(ManifestTable.read(spark, dir).count() == 300 - d2)
    // CDF front door across both deletes, mapped names throughout
    val feed = spark.read.format("graft-manifest")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .load(dir)
    assert(feed.columns.contains("val"))
    assert(feed.filter(col("_change_type") === "delete").count() ==
      100 + d2)
    // purge materializes under the mapping; content identical
    ManifestTable.purgeDvs(spark, dir)
    val after = ManifestTable.read(spark, dir)
    assert(after.columns.toSeq == Seq("k", "val"))
    assert(after.count() == 300 - d2)
    assert(ManifestTable.snapshot(spark, dir).entries.forall(_.dv.isEmpty))
    cleanup(dir)
  }

  test("VOLUME: 10^6 deleted positions never materialize on the " +
      "driver — input partitions carry DV paths, readers load their " +
      "own slice; reads and CDF stay exact") {
    import spark.implicits._
    val dir = fresh()
    val n = 1500000L
    ManifestTable.create(spark, dir,
      spark.range(n).select(col("id").as("k")).repartition(3))
    val (_, deleted) =
      ManifestTable.deleteRowsMor(spark, dir, col("k") < 1000000L)
    assert(deleted == 1000000L)
    // the plan-level check the r11 verdict asked for: every dirty
    // partition ships PATHS (per-key DV slices), never positions —
    // DvInputPartition has no position array to smuggle them in
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val probe = spark.read.format("graft-manifest").load(dir)
    val parts = probe.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.partitions.flatten
    }.getOrElse(sys.error("no BatchScanExec in the DV read plan"))
    val dvParts = parts.collect {
      case p: graft.sources.DvInputPartition => p }
    assert(dvParts.nonEmpty, "expected DV partitions in the plan")
    assert(dvParts.forall(_.dvFiles.nonEmpty),
      "every dirty partition must name its DV parquet slice")
    // per-file slicing really happened: each partition's DV files live
    // under its own __k= directory, so no reader scans another file's
    // million positions
    assert(dvParts.forall(p =>
      p.dvFiles.forall(_.contains("/__k=" + DvStore.keyHex(p.key) + "/"))),
      "DV files must be the partition's own per-key slice")
    assert(probe.count() == n - 1000000L)
    assert(probe.agg(sum(col("k"))).first().getLong(0) ==
      (1000000L until n).sum)
    // CDF front door: the delete rows also come off the per-key
    // slices, diffed executor-side
    val feed = spark.read.format("graft-manifest")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .load(dir)
    assert(feed.filter(col("_change_type") === "delete").count() ==
      1000000L)
    cleanup(dir)
  }
}
