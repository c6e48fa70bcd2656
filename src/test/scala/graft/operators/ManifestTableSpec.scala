package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ManifestTableSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-mt-").toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  test("create/append/time-travel: every version reads its exact rows") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 100L).toDF("k"))
    ManifestTable.append(spark, dir, (100L until 250L).toDF("k"))
    ManifestTable.append(spark, dir, (250L until 300L).toDF("k"))
    assert(ManifestTable.versions(spark, dir) == Vector(1, 2, 3))
    assert(ManifestTable.read(spark, dir, Some(1)).count() == 100)
    assert(ManifestTable.read(spark, dir, Some(2)).count() == 250)
    assert(ManifestTable.read(spark, dir).count() == 300)
    // exact content, not just counts
    val v2 = ManifestTable.read(spark, dir, Some(2))
      .agg(sum($"k")).first().getLong(0)
    assert(v2 == (0L until 250L).sum)
    cleanup(dir)
  }

  test("auto multi-column stats: every write records [lo, hi] for " +
      "integral columns with no DDL; compaction folds them exactly") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 100L).map(i => (i, i * 3, s"s$i")).toDF("a", "b", "txt"))
    ManifestTable.append(spark, dir,
      (100L until 200L).map(i => (i, i * 3, s"s$i")).toDF("a", "b", "txt"))
    val snap = ManifestTable.snapshot(spark, dir)
    // both integral columns got stats, the string column did not
    assert(snap.entries.forall(e =>
      e.stats.contains("a") && e.stats.contains("b") &&
        !e.stats.contains("txt")))
    assert(snap.entries.map(_.stats("a")._1).min == 0L)
    assert(snap.entries.map(_.stats("b")._2).max == 199L * 3)
    // compaction folds member stats without re-reading data
    ManifestTable.compactCommit(spark, dir, targetBytes = 512L << 20)
    val merged = ManifestTable.snapshot(spark, dir)
    assert(merged.entries.size == 1)
    assert(merged.entries.head.stats("a") == ((0L, 199L)))
    assert(merged.entries.head.stats("b") == ((0L, 199L * 3)))
    cleanup(dir)
  }

  test("mergeCommit racing a concurrent batch append: the loser " +
      "re-reads and re-applies, the append's rows are merged too") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 100L).toDF("k"))
    // the append commits INSIDE the merge's read-transform window
    // (once), forcing the merge's first tryCommit to lose the race
    val appended = new java.util.concurrent.atomic.AtomicBoolean(false)
    ManifestTable.mergeCommit(spark, dir, cur => {
      if (!appended.getAndSet(true))
        ManifestTable.append(spark, dir, (100L until 110L).toDF("k"))
      cur.filter(col("k") % 2 === 0)
    })
    // the retry saw the appended rows: evens of 0..109, not 0..99
    val got = ManifestTable.read(spark, dir)
    assert(got.count() == 55)
    assert(got.agg(sum($"k")).first().getLong(0) ==
      (0L until 110L).filter(_ % 2 == 0).sum)
    // and the merge is idempotent under a txn marker (the streaming
    // MERGE INTO redelivery contract)
    val v1 = ManifestTable.mergeCommit(spark, dir,
      cur => cur.filter(col("k") < 50), txn = Some("job:m1"))
    val v2 = ManifestTable.mergeCommit(spark, dir,
      cur => cur.limit(0) /* would wipe if re-applied */,
      txn = Some("job:m1"))
    assert(v1 == v2)
    assert(ManifestTable.read(spark, dir).count() == 25)
    cleanup(dir)
  }

  test("concurrent appends: the loser retries, both land, nothing lost") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 10L).toDF("k"))
    // two writers race repeatedly on the same next version; append's
    // optimistic retry must absorb every lost race
    val fa = Future {
      (0 until 5).foreach(i =>
        ManifestTable.append(spark, dir,
          Seq(1000L + i).toDF("k")))
    }
    val fb = Future {
      (0 until 5).foreach(i =>
        ManifestTable.append(spark, dir,
          Seq(2000L + i).toDF("k")))
    }
    Await.result(fa, 120.seconds)
    Await.result(fb, 120.seconds)
    // 11 committed versions, every append visible exactly once
    assert(ManifestTable.versions(spark, dir) == (1 to 11).toVector)
    val ks = ManifestTable.read(spark, dir)
      .collect().map(_.getLong(0)).sorted.toVector
    assert(ks == ((0L until 10L) ++
      (0 until 5).map(1000L + _) ++ (0 until 5).map(2000L + _))
      .sorted.toVector)
    cleanup(dir)
  }

  test("compactCommit: content identical, fewer files, old version intact") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 3000L).toDF("k").repartition(12))
    val v1Files = ManifestTable.snapshot(spark, dir, Some(1)).paths
    assert(v1Files.size == 12)
    ManifestTable.compactCommit(spark, dir, targetBytes = 64L << 20)
    val v2 = ManifestTable.snapshot(spark, dir, Some(2))
    assert(v2.paths.size < 12)
    assert(ManifestTable.read(spark, dir, Some(2)).count() == 3000)
    // time travel to v1 still reads the ORIGINAL 12 files
    assert(ManifestTable.snapshot(spark, dir, Some(1)).paths == v1Files)
    assert(ManifestTable.read(spark, dir, Some(1)).count() == 3000)
    cleanup(dir)
  }

  test("vacuum: drops unreachable files and manifests, keeps the rest") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 500L).toDF("k")
      .repartition(8))
    ManifestTable.compactCommit(spark, dir, targetBytes = 64L << 20)
    ManifestTable.append(spark, dir, (500L until 600L).toDF("k"))
    ManifestTable.vacuum(spark, dir, keep = 2)
    assert(ManifestTable.versions(spark, dir) == Vector(2, 3))
    assert(ManifestTable.read(spark, dir).count() == 600)
    assert(ManifestTable.read(spark, dir, Some(2)).count() == 500)
    // v1's 8 small files are physically gone (v2 compacted them away)
    intercept[IllegalArgumentException] {
      ManifestTable.snapshot(spark, dir, Some(1))
    }
    cleanup(dir)
  }

  test("file stats prune reads from the manifest; residual keeps exactness") {
    import spark.implicits._
    val dir = fresh()
    // three disjoint key ranges, 3 files each: range-tight stats
    ManifestTable.create(spark, dir,
      (0L until 100L).toDF("k").repartition(3), statsCol = Some("k"))
    ManifestTable.append(spark, dir,
      (100L until 200L).toDF("k").repartition(3), statsCol = Some("k"))
    ManifestTable.append(spark, dir,
      (200L until 300L).toDF("k").repartition(3), statsCol = Some("k"))
    val (df, read0, total) = ManifestTable.readRange(spark, dir, "k", 120, 180)
    assert(total == 9 && read0 <= 3 && read0 >= 1) // middle slice only
    assert(df.count() == 61 &&
      df.agg(min($"k"), max($"k")).head() ===
        org.apache.spark.sql.Row(120L, 180L))
    // a range touching two slices reads both but never the third
    val (df2, read2, _) = ManifestTable.readRange(spark, dir, "k", 90, 110)
    assert(read2 <= 6 && df2.count() == 21)
    // stats-less entries are read conservatively, never skipped
    ManifestTable.append(spark, dir, Seq(500L).toDF("k")) // no stats
    val (df3, read3, total3) = ManifestTable.readRange(spark, dir, "k", 400, 600)
    assert(total3 == 10 && read3 >= 1 && df3.count() == 1)
    cleanup(dir)
  }

  test("txn markers make append exactly-once; bootstrap via append works") {
    import spark.implicits._
    val dir = fresh()
    // first append bootstraps v1 (no create)
    val v1 = ManifestTable.append(spark, dir, (0L until 10L).toDF("k"),
      txn = Some("job:0"))
    assert(v1 == 1)
    // same marker: log-level no-op, same version, nothing written
    val v1b = ManifestTable.append(spark, dir, (0L until 10L).toDF("k"),
      txn = Some("job:0"))
    assert(v1b == 1 && ManifestTable.versions(spark, dir) == Vector(1))
    assert(ManifestTable.read(spark, dir).count() == 10)
    // a new marker commits; replaying BOTH markers is still a no-op
    ManifestTable.append(spark, dir, (10L until 15L).toDF("k"),
      txn = Some("job:1"))
    ManifestTable.append(spark, dir, (0L until 10L).toDF("k"),
      txn = Some("job:0"))
    ManifestTable.append(spark, dir, (10L until 15L).toDF("k"),
      txn = Some("job:1"))
    assert(ManifestTable.versions(spark, dir) == Vector(1, 2))
    assert(ManifestTable.read(spark, dir).count() == 15)
    assert(ManifestTable.txnVersion(spark, dir, "job:1").contains(2))
    cleanup(dir)
  }

  test("mergeCommit: concurrent COW DML loses no update (re-read + re-apply)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 100L).map((_, 0L)).toDF("k", "v"))
    // two writers each add +1 to every row, three times — any lost
    // update leaves some v below 6
    def bump() = (0 until 3).foreach { _ =>
      ManifestTable.mergeCommit(spark, dir,
        cur => cur.withColumn("v", col("v") + 1L))
    }
    val fa = Future(bump())
    val fb = Future(bump())
    Await.result(fa, 120.seconds)
    Await.result(fb, 120.seconds)
    val vs = ManifestTable.read(spark, dir)
      .agg(min($"v"), max($"v"), count(lit(1))).head()
    assert(vs === org.apache.spark.sql.Row(6L, 6L, 100L))
    assert(ManifestTable.versions(spark, dir) == (1 to 7).toVector)
    // pre-merge time travel: v1 is still all zeros
    assert(ManifestTable.read(spark, dir, Some(1))
      .agg(max($"v")).head().getLong(0) == 0L)
    cleanup(dir)
  }

  test("schema evolution: log schema wins, old rows null-fill, compaction keeps it") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 50L).map(k => (k, k * 2)).toDF("k", "v").repartition(2))
    // evolve: add a tag column; shared columns must type-match
    ManifestTable.appendEvolve(spark, dir,
      (50L until 60L).map(k => (k, k * 2, s"t$k")).toDF("k", "v", "tag")
        .repartition(2))
    val evolved = ManifestTable.read(spark, dir)
    assert(evolved.columns.toSeq == Seq("k", "v", "tag"))
    assert(evolved.count() == 60 &&
      evolved.filter($"tag".isNull).count() == 50)
    // time travel to v1: the pre-evolution 2-column schema
    assert(ManifestTable.read(spark, dir, Some(1)).columns.toSeq ==
      Seq("k", "v"))
    // a later PLAIN append keeps the evolved schema
    ManifestTable.append(spark, dir,
      (60L until 65L).map(k => (k, k * 2, s"t$k")).toDF("k", "v", "tag"))
    assert(ManifestTable.read(spark, dir).columns.toSeq ==
      Seq("k", "v", "tag"))
    // compaction merges mixed-schema bins under the LOG schema
    ManifestTable.compactCommit(spark, dir, targetBytes = 64L << 20)
    val compacted = ManifestTable.read(spark, dir)
    assert(compacted.columns.toSeq == Seq("k", "v", "tag") &&
      compacted.count() == 65 &&
      compacted.filter($"tag".isNull).count() == 50)
    // type coercion is refused loudly
    intercept[IllegalArgumentException] {
      ManifestTable.appendEvolve(spark, dir,
        Seq(("no", 1L, "t")).toDF("k", "v", "tag")) // k: string vs bigint
    }
    cleanup(dir)
  }

  test("a visible manifest is always complete: no temp leaks into the " +
      "version list, vacuum sweeps orphan commit temps") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 10L).toDF("k"))
    ManifestTable.append(spark, dir, (10L until 20L).toDF("k"))
    // simulate a crashed writer: a complete temp for an ALREADY
    // COMMITTED version (lost race, never cleaned) and one for a
    // future version (in-flight, must survive)
    val md = new java.io.File(new java.io.File(dir), "_manifests")
    val orphan = new java.io.File(md, ".tmp-v000002.json.deadbeef")
    java.nio.file.Files.writeString(orphan.toPath, "{garbage")
    val inflight = new java.io.File(md, ".tmp-v000099.json.cafe0000")
    java.nio.file.Files.writeString(inflight.toPath, "{inflight")
    // temps are invisible to version resolution and reads
    assert(ManifestTable.versions(spark, dir) == Vector(1, 2))
    assert(ManifestTable.read(spark, dir).count() == 20)
    ManifestTable.vacuum(spark, dir, keep = 2)
    assert(!orphan.exists(), "orphan temp for a committed version survived")
    assert(inflight.exists(), "in-flight future-version temp was swept")
    cleanup(dir)
  }

  test("a crash between temp write and publish wedges nothing: the next " +
      "commit takes the version") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 10L).toDF("k"))
    // a writer that died after phase 1: complete temp, no vN.json
    val md = new java.io.File(new java.io.File(dir), "_manifests")
    java.nio.file.Files.writeString(
      new java.io.File(md, ".tmp-v000002.json.00000000").toPath,
      "{\"version\": 2, \"compaction\": false, \"files\": [\n]}")
    // readers see v1 only; a fresh append commits v2 unobstructed
    assert(ManifestTable.snapshot(spark, dir).version == 1)
    assert(ManifestTable.append(spark, dir, (10L until 15L).toDF("k")) == 2)
    assert(ManifestTable.read(spark, dir).count() == 15)
    cleanup(dir)
  }

  test("txn markers and schema DDL with quotes/newlines survive the " +
      "manifest round trip unmangled") {
    import spark.implicits._
    val dir = fresh()
    val evil = "job:\"q\"\nline2\t\\end"
    ManifestTable.append(spark, dir, (0L until 10L).toDF("k"),
      txn = Some(evil))
    assert(ManifestTable.snapshot(spark, dir).txns.get(evil).contains(1))
    assert(ManifestTable.txnVersion(spark, dir, evil).contains(1))
    // replay with the same evil marker is still a no-op
    assert(ManifestTable.append(spark, dir, (0L until 10L).toDF("k"),
      txn = Some(evil)) == 1)
    // a backtick-quoted column name whose DDL carries spaces survives
    // as log schema (DDL with quotes is rejected by Spark's parser
    // itself, so spaces + backticks are the realistic hostile case)
    ManifestTable.appendEvolve(spark, dir,
      (10L until 12L).toDF("k")
        .withColumn("odd name, with comma", lit(1L)))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.schemaDdl.exists(_.contains("odd name, with comma")))
    val latest = ManifestTable.read(spark, dir)
    assert(latest.columns.toSeq == Seq("k", "odd name, with comma"))
    assert(latest.count() == 12)
    cleanup(dir)
  }

  test("concurrent appendEvolve: the race loser re-evolves from the " +
      "winner's schema — no column silently dropped") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = fresh()
    ManifestTable.create(spark, dir,
      (0L until 20L).map(k => (k, k)).toDF("k", "v"))
    // two writers each evolve a DIFFERENT new column, repeatedly —
    // a loser committing its pre-race schema would erase the winner's
    // column from the log
    val fa = Future((0 until 3).foreach(i =>
      ManifestTable.appendEvolve(spark, dir,
        Seq((100L + i, 1L, s"a$i")).toDF("k", "v", s"col_a$i"))))
    val fb = Future((0 until 3).foreach(i =>
      ManifestTable.appendEvolve(spark, dir,
        Seq((200L + i, 1L, i.toLong)).toDF("k", "v", s"col_b$i"))))
    Await.result(fa, 120.seconds)
    Await.result(fb, 120.seconds)
    val cols = ManifestTable.read(spark, dir).columns.toSet
    (0 until 3).foreach { i =>
      assert(cols.contains(s"col_a$i"), s"col_a$i dropped by a lost race")
      assert(cols.contains(s"col_b$i"), s"col_b$i dropped by a lost race")
    }
    assert(ManifestTable.read(spark, dir).count() == 26)
    cleanup(dir)
  }

  test("a 100-version table resolves from checkpoint + ≤N tail deltas") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, Seq(1L).toDF("k"))
    (2 to 100).foreach(v =>
      ManifestTable.append(spark, dir, Seq(v.toLong).toDF("k")))
    // the commit cadence folded checkpoints at every multiple of N
    val cks = ManifestTable.checkpointVersions(spark, dir)
    assert(cks == (10 to 100 by 10).toVector, s"checkpoints: $cks")
    // PROOF that resolution reads checkpoint + tail only: delete the
    // delta manifests a checkpointed resolution must not need (all
    // below v91) and resolve latest + a mid-tail AS OF — both exact
    val md = new java.io.File(new java.io.File(dir), "_manifests")
    (1 to 90).foreach { v =>
      val f = new java.io.File(md, f"v$v%06d.json")
      assert(f.delete(), s"couldn't delete v$v")
    }
    assert(ManifestTable.versions(spark, dir) == (91 to 100).toVector)
    val latest = ManifestTable.read(spark, dir)
    assert(latest.count() == 100)
    assert(latest.agg(sum($"k")).first().getLong(0) == (1L to 100L).sum)
    assert(ManifestTable.read(spark, dir, Some(95)).count() == 95)
    // resolution below the surviving checkpoint+tail window refuses
    intercept[IllegalArgumentException] {
      ManifestTable.snapshot(spark, dir, Some(42))
    }
    cleanup(dir)
  }

  test("vacuum forces a checkpoint at the oldest kept version so kept " +
      "versions never need the dropped deltas") {
    import spark.implicits._
    val dir = fresh()
    // 7 versions, none on the checkpoint cadence boundary
    ManifestTable.create(spark, dir, Seq(1L).toDF("k"))
    (2 to 7).foreach(v =>
      ManifestTable.append(spark, dir, Seq(v.toLong).toDF("k")))
    assert(ManifestTable.checkpointVersions(spark, dir).isEmpty)
    ManifestTable.vacuum(spark, dir, keep = 3)
    // v5 checkpoint was forced; v1–v4 deltas are gone; all kept
    // versions still resolve exactly
    assert(ManifestTable.checkpointVersions(spark, dir) == Vector(5))
    assert(ManifestTable.versions(spark, dir) == Vector(5, 6, 7))
    (5 to 7).foreach { v =>
      val got = ManifestTable.read(spark, dir, Some(v))
        .agg(sum($"k"), count(lit(1))).first()
      assert(got.getLong(0) == (1L to v.toLong).sum && got.getLong(1) == v,
        s"v$v resolved wrong: $got")
    }
    cleanup(dir)
  }

  test("txn markers survive vacuum through the checkpoint") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.append(spark, dir, Seq(1L).toDF("k"), txn = Some("b:0"))
    (2 to 6).foreach(v =>
      ManifestTable.append(spark, dir, Seq(v.toLong).toDF("k"),
        txn = Some(s"b:${v - 1}")))
    ManifestTable.vacuum(spark, dir, keep = 2)
    // v1's manifest (and its txn action) is gone, but the forced
    // checkpoint carries the marker: redelivery is still a no-op
    assert(ManifestTable.versions(spark, dir) == Vector(5, 6))
    assert(ManifestTable.txnVersion(spark, dir, "b:0").contains(1))
    assert(ManifestTable.append(spark, dir, Seq(99L).toDF("k"),
      txn = Some("b:0")) == 1)
    assert(ManifestTable.read(spark, dir).count() == 6)
    cleanup(dir)
  }

  test("overwrite replaces content; create refuses an existing table") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 50L).toDF("k"))
    ManifestTable.overwrite(spark, dir, (900L until 910L).toDF("k"))
    assert(ManifestTable.read(spark, dir).count() == 10)
    assert(ManifestTable.read(spark, dir, Some(1)).count() == 50)
    intercept[IllegalArgumentException] {
      ManifestTable.create(spark, dir, (0L until 5L).toDF("k"))
    }
    cleanup(dir)
  }
}
