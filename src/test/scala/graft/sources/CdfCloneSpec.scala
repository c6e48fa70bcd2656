package graft.sources

import graft.streaming.TestSpark
import graft.operators.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 table-format additions:
  *
  *   - the CHANGE-DATA-FEED face of the DSv2 front door
  *     (`option("readChangeFeed", true)`, batch + streaming) — must
  *     agree row-for-row with `ManifestTable.changeFeedRows`;
  *   - SHALLOW CLONE (`ManifestTable.cloneShallow` / `CALL clone`) —
  *     zero data copied, independent logs, DV-carrying snapshots
  *     clone correctly, compaction materializes.
  */
class CdfCloneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag-").toString

  private def cleanup(root: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

  private def seed(n: Long) = {
    import spark.implicits._
    (0L until n).map(i => (i, i % 10, s"r$i")).toDF("k", "m", "s")
  }

  // ---- change-data-feed front door ------------------------------------

  test("batch CDF through the door equals changeFeedRows across " +
      "insert + MOR delete + compaction + COW-update capture") {
    import spark.implicits._
    val root = fresh("cdf")
    val dir = s"$root/t"
    try {
      ManifestTable.create(spark, dir, seed(600).filter($"k" < 300)
        .repartition(3))                                       // v1
      ManifestTable.append(spark, dir, seed(600).filter($"k" >= 300)
        .repartition(2))                                       // v2
      ManifestTable.deleteRowsMor(spark, dir,
        $"m" === 3 && $"k" < 300)                              // v3
      val cv = ManifestTable.compactCommit(spark, dir,
        targetBytes = 128L << 20)                              // v4 silent
      ManifestTable.mergeCommit(spark, dir,                    // v5 capture
        cur => cur.withColumn("m",
          when($"m" === 7, lit(70L)).otherwise($"m")),
        cdcLabels = Some(("update_preimage", "update_postimage")))
      val door = spark.read.format("graft-manifest")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1).load(dir)
      val feed = ManifestTable.changeFeedRows(spark, dir, 0,
        ManifestTable.versions(spark, dir).last)
      assert(door.columns.toSeq ==
        Seq("k", "m", "s", "_change_type", "_commit_version"))
      assert(door.exceptAll(feed).isEmpty &&
        feed.exceptAll(door).isEmpty)
      // per-kind counts: 600 inserts, 30 MOR deletes, 60+60 update
      // images (m==7 on both halves survive the m==3 delete)
      val byKind = door.groupBy($"_change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byKind == Map("insert" -> 600L, "delete" -> 30L,
        "update_preimage" -> 60L, "update_postimage" -> 60L))
      // compaction emitted nothing
      assert(door.filter($"_commit_version" === cv).count() == 0)
      // startingVersion skips earlier versions entirely
      val late = spark.read.format("graft-manifest")
        .option("readChangeFeed", "true")
        .option("startingVersion", 3).load(dir)
      assert(late.filter($"_change_type" === "insert").count() == 0)
      assert(late.count() == 30 + 120)
    } finally cleanup(root)
  }

  test("streaming CDF tails incrementally with version offsets in " +
      "the checkpoint") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = fresh("scdf")
    val dir = s"$root/t"
    val ckpt = s"$root/ckpt"
    try {
      ManifestTable.create(spark, dir, seed(200).repartition(2)) // v1
      val buf =
        scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      def drain(): Seq[Int] = {
        val seen = scala.collection.mutable
          .ArrayBuffer[org.apache.spark.sql.Row]()
        val q = spark.readStream.format("graft-manifest")
          .option("readChangeFeed", "true").load(dir)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                _: Long) =>
              seen.synchronized { seen ++= b.collect() }
              ()
          }
          .start()
        q.awaitTermination()
        buf ++= seen
        seen.map(_.getInt(4)).distinct.sorted.toSeq
      }
      assert(drain() == Seq(1))
      ManifestTable.deleteRowsMor(spark, dir, $"m" === 0)       // v2
      assert(drain() == Seq(2))                                 // only v2
      assert(drain().isEmpty)                                   // no-op
      assert(buf.count(_.getString(3) == "insert") == 200)
      assert(buf.count(_.getString(3) == "delete") == 20)
    } finally cleanup(root)
  }

  test("CDF reads a column-mapped table under its logical names") {
    import spark.implicits._
    val root = fresh("cdfmap")
    val dir = s"$root/t"
    try {
      ManifestTable.create(spark, dir, seed(100))                // v1
      ManifestTable.renameColumn(spark, dir, "m", "mode")        // v2 meta
      ManifestTable.append(spark, dir, seed(100)
        .withColumnRenamed("m", "mode"))                         // v3
      val door = spark.read.format("graft-manifest")
        .option("readChangeFeed", "true").load(dir)
      assert(door.columns.toSeq ==
        Seq("k", "mode", "s", "_change_type", "_commit_version"))
      assert(door.count() == 200)
      assert(door.agg(sum($"mode")).first().getLong(0) ==
        2 * (0L until 100L).map(_ % 10).sum)
    } finally cleanup(root)
  }

  // ---- shallow clone ---------------------------------------------------

  test("shallow clone copies zero data, carries DVs correctly, and " +
      "the logs diverge independently") {
    import spark.implicits._
    val root = fresh("clone")
    val src = s"$root/src"
    val dst = s"$root/dst"
    try {
      ManifestTable.create(spark, src, seed(500).repartition(4))
      ManifestTable.deleteRowsMor(spark, src, $"m" === 3)   // 50 rows
      ManifestTable.cloneShallow(spark, src, dst)
      // the clone reads the MOR survivors exactly (DV keys absolutized)
      assert(ManifestTable.read(spark, dst).count() == 450)
      assert(ManifestTable.read(spark, dst)
        .filter($"m" === 3).count() == 0)
      // zero data copied: every data entry resolves into the SOURCE dir
      val snap = ManifestTable.snapshot(spark, dst)
      assert(snap.entries.forall(e =>
        ManifestTable.resolvePath(dst, e.path).startsWith(src)))
      // schema + constraints carried; divergence is two-way invisible
      ManifestTable.append(spark, dst, seed(100))
      ManifestTable.mergeCommit(spark, src, cur => cur.filter($"m" =!= 5))
      assert(ManifestTable.read(spark, dst).count() == 550)
      assert(ManifestTable.read(spark, src).count() == 400)
      // relocating the CLONE keeps it readable (its DVs are relative,
      // its data refs absolute)
      val moved = s"$root/dst2"
      new java.io.File(dst).renameTo(new java.io.File(moved))
      assert(ManifestTable.read(spark, moved).count() == 550)
    } finally cleanup(root)
  }

  test("compaction materializes the clone; vacuum then never touches " +
      "source files") {
    import spark.implicits._
    val root = fresh("clonemat")
    val src = s"$root/src"
    val dst = s"$root/dst"
    try {
      ManifestTable.create(spark, src, seed(300).repartition(3))
      ManifestTable.cloneShallow(spark, src, dst)
      ManifestTable.compactCommit(spark, dst, targetBytes = 128L << 20)
      val snap = ManifestTable.snapshot(spark, dst)
      // after OPTIMIZE every live entry is clone-local
      assert(snap.entries.forall(e =>
        ManifestTable.resolvePath(dst, e.path).startsWith(dst)))
      ManifestTable.vacuum(spark, dst, keep = 1)
      // vacuum swept only under the clone: the source is intact
      assert(ManifestTable.read(spark, src).count() == 300)
      assert(ManifestTable.read(spark, dst).count() == 300)
    } finally cleanup(root)
  }

  test("CALL clone forks a catalog table readable by SQL") {
    import spark.implicits._
    val cat = s"gclone_${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = fresh("clonecat")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      ManifestTable.create(spark, s"$wh/a", seed(120))
      val r = spark.sql(s"CALL $cat.clone(tbl => 'a', target => 'b')")
        .first()
      assert(r.getInt(0) == 1)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.b").first()
        .getLong(0) == 120)
      // version pinning: clone AS OF an older version
      ManifestTable.append(spark, s"$wh/a", seed(30))
      spark.sql(s"CALL $cat.clone(tbl => 'a', target => 'c', " +
        "version => 1)")
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.c").first()
        .getLong(0) == 120)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      cleanup(wh)
    }
  }
}
