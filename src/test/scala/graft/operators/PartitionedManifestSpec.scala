package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The partitioned-table tier of the manifest format: partition
  * tuples in the log, exact partition pruning, dynamic partition
  * overwrite, RESTORE, and the Z-ordered clustered rewrite with
  * multi-column file stats. */
class PartitionedManifestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-pmt-").toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  /** Files planned by the executed DSv2 scan — the real artifact
    * partition pruning must shrink. */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.partitions.flatten.map {
        case fp: FilePartition => fp.files.length
        case _ => 1
      }.sum
    }.getOrElse(-1)
  }

  private def mkDf(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"g${i % 4}", (i % 100).toLong))
      .toDF("k", "grp", "v")
  }

  test("partitioned create: every file carries exactly one tuple, " +
      "recorded in the log, and content reads back exactly") {
    val dir = fresh()
    val df = mkDf(400)
    ManifestTable.create(spark, dir, df, partitionBy = Seq("grp"))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.partCols == Seq("grp"))
    assert(snap.entries.nonEmpty)
    assert(snap.entries.forall(_.part.keySet == Set("grp")))
    assert(snap.entries.map(_.part("grp")).toSet ==
      Set("g0", "g1", "g2", "g3"))
    // the REAL column stays inside the data files: per-file reads
    // need no basePath reconstruction
    val back = ManifestTable.read(spark, dir)
    assert(back.columns.toSeq == Seq("k", "grp", "v"))
    assert(back.count() == 400)
    assert(back.agg(sum(col("k"))).first().getLong(0) ==
      (0L until 400L).sum)
    // per-partition counts exact
    val per = back.groupBy(col("grp")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("g0" -> 100L, "g1" -> 100L, "g2" -> 100L,
      "g3" -> 100L))
    cleanup(dir)
  }

  test("append keeps the layout; partition pruning through the DSv2 " +
      "front door plans only the matching partition's files") {
    val dir = fresh()
    ManifestTable.create(spark, dir, mkDf(400), partitionBy = Seq("grp"))
    ManifestTable.append(spark, dir, mkDf(400).withColumn("k",
      col("k") + 1000L))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.entries.forall(_.part.contains("grp")))
    val total = snap.entries.size
    val one = spark.read.format("graft-manifest").load(dir)
      .filter(col("grp") === "g2")
    val planned = plannedFiles(one)
    val expected = snap.entries.count(_.part("grp") == "g2")
    assert(planned == expected, s"planned $planned, want $expected of $total")
    assert(planned < total)
    // and the result is exact despite the pruning
    assert(one.count() == 200)
    // IN-list pruning
    val two = spark.read.format("graft-manifest").load(dir)
      .filter(col("grp").isin("g0", "g3"))
    assert(plannedFiles(two) ==
      snap.entries.count(e => Set("g0", "g3").contains(e.part("grp"))))
    assert(two.count() == 400)
    cleanup(dir)
  }

  test("overwritePartitions replaces exactly the touched partitions; " +
      "untouched files survive byte-identical") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, mkDf(400), partitionBy = Seq("grp"))
    val before = ManifestTable.snapshot(spark, dir)
    val untouchedBefore = before.entries.filterNot(_.part("grp") == "g1")
      .map(_.path).toSet
    // replace g1 wholesale with 10 new rows
    val repl = (0 until 10).map(i => (9000L + i, "g1", 7L))
      .toDF("k", "grp", "v")
    ManifestTable.overwritePartitions(spark, dir, repl)
    val after = ManifestTable.snapshot(spark, dir)
    // untouched partitions: same files, not rewritten
    val untouchedAfter = after.entries.filterNot(_.part("grp") == "g1")
      .map(_.path).toSet
    assert(untouchedAfter == untouchedBefore)
    // g1 is exactly the replacement
    val g1 = ManifestTable.read(spark, dir).filter(col("grp") === "g1")
    assert(g1.count() == 10)
    assert(g1.agg(min(col("k"))).first().getLong(0) == 9000L)
    // other partitions untouched in content
    assert(ManifestTable.read(spark, dir)
      .filter(col("grp") =!= "g1").count() == 300)
    // time travel to the pre-overwrite version still shows old g1
    assert(ManifestTable.read(spark, dir, Some(before.version))
      .filter(col("grp") === "g1").count() == 100)
    // idempotent under a txn marker
    val v1 = ManifestTable.overwritePartitions(spark, dir, repl,
      txn = Some("job:g1"))
    val v2 = ManifestTable.overwritePartitions(spark, dir, repl,
      txn = Some("job:g1"))
    assert(v1 == v2)
    cleanup(dir)
  }

  test("overwritePartitions keeps the declared stats column: rewritten " +
      "partitions' entries carry [lo, hi], so skipping never erodes") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, mkDf(400),
      statsCol = Some("k"), partitionBy = Seq("grp"))
    assert(ManifestTable.snapshot(spark, dir).entries
      .forall(e => e.lo.isDefined && e.hi.isDefined))
    val repl = (0 until 10).map(i => (9000L + i, "g1", 7L))
      .toDF("k", "grp", "v")
    ManifestTable.overwritePartitions(spark, dir, repl)
    val after = ManifestTable.snapshot(spark, dir)
    val g1 = after.entries.filter(_.part("grp") == "g1")
    assert(g1.nonEmpty)
    assert(g1.forall(e => e.lo.exists(_ >= 9000L) &&
      e.hi.exists(_ <= 9009L)),
      s"replacement entries lost their stats: ${g1.map(e => (e.lo, e.hi))}")
    cleanup(dir)
  }

  test("restore re-points the log to a prior version without copying " +
      "data; history is preserved and the restore is itself undoable") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 100L).toDF("k"))
    ManifestTable.append(spark, dir, (100L until 200L).toDF("k"))
    ManifestTable.overwrite(spark, dir, (500L until 510L).toDF("k"))
    assert(ManifestTable.read(spark, dir).count() == 10)
    val v = ManifestTable.restore(spark, dir, 2)
    assert(v == 4)
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 200)
    assert(back.agg(sum(col("k"))).first().getLong(0) ==
      (0L until 200L).sum)
    // the overwritten state is still reachable (history intact)
    assert(ManifestTable.read(spark, dir, Some(3)).count() == 10)
    // restore of the restore: back to the overwrite state
    ManifestTable.restore(spark, dir, 3)
    assert(ManifestTable.read(spark, dir).count() == 10)
    // schema restore rides too: evolve then restore drops the column
    ManifestTable.evolveSchema(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.StringType))))
    assert(ManifestTable.read(spark, dir).columns.toSeq ==
      Seq("k", "extra"))
    ManifestTable.restore(spark, dir, 3)
    assert(ManifestTable.read(spark, dir).columns.toSeq == Seq("k"))
    cleanup(dir)
  }

  test("clusterCommit: Z-ordered rewrite records multi-column stats " +
      "and BOTH dimensions prune files from the manifest") {
    import spark.implicits._
    val dir = fresh()
    // a 64x64 grid in row-major order: linear layout would give
    // full-range y stats in every file
    val grid = (0 until 4096).map(i => (i.toLong, (i / 64).toLong,
      (i % 64).toLong)).toDF("id", "x", "y")
    ManifestTable.create(spark, dir, grid.repartition(8))
    ManifestTable.clusterCommit(spark, dir, ("x", "y"), targetFiles = 16)
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.entries.size == 16)
    assert(snap.entries.forall(e =>
      e.stats.contains("x") && e.stats.contains("y")))
    // pruning through the front door, each dimension alone
    val total = snap.entries.size
    val byX = spark.read.format("graft-manifest").load(dir)
      .filter(col("x") >= 10 && col("x") <= 13)
    val byY = spark.read.format("graft-manifest").load(dir)
      .filter(col("y") >= 50 && col("y") <= 53)
    assert(plannedFiles(byX) < total,
      s"x-range planned ${plannedFiles(byX)} of $total")
    assert(plannedFiles(byY) < total,
      s"y-range planned ${plannedFiles(byY)} of $total")
    // results stay exact
    assert(byX.count() == 4 * 64)
    assert(byY.count() == 4 * 64)
    assert(spark.read.format("graft-manifest").load(dir).count() == 4096)
    // the rewrite is dataChange=false: a change feed from v1 sees
    // only the original adds
    val feed = ManifestTable.changedEntries(spark, dir, 0, snap.version)
    assert(feed.map(_.rows).sum == 4096)
    cleanup(dir)
  }

  test("partitioned compaction merges within partitions only; merged " +
      "entries keep their tuple") {
    import spark.implicits._
    val dir = fresh()
    val df = mkDf(400)
    ManifestTable.create(spark, dir, df.repartition(6),
      partitionBy = Seq("grp"))
    ManifestTable.append(spark, dir, df.repartition(5))
    val before = ManifestTable.snapshot(spark, dir)
    assert(before.entries.size > 8) // plenty of small files
    ManifestTable.compactCommit(spark, dir, targetBytes = 64L << 20)
    val after = ManifestTable.snapshot(spark, dir)
    assert(after.entries.size < before.entries.size)
    assert(after.entries.forall(_.part.keySet == Set("grp")))
    // one merged file per partition at this size
    assert(after.entries.map(_.part("grp")).toSet ==
      Set("g0", "g1", "g2", "g3"))
    val back = ManifestTable.read(spark, dir)
    assert(back.count() == 800)
    assert(back.groupBy(col("grp")).count().collect()
      .forall(_.getLong(1) == 200))
    cleanup(dir)
  }

  test("checkpoint round-trips partition tuples, the partition spec " +
      "and multi-column stats") {
    val dir = fresh()
    ManifestTable.create(spark, dir, mkDf(200), partitionBy = Seq("grp"))
    ManifestTable.append(spark, dir, mkDf(100))
    val v = ManifestTable.snapshot(spark, dir).version
    ManifestTable.writeCheckpoint(spark, dir, v)
    assert(ManifestTable.checkpointVersions(spark, dir).contains(v))
    ManifestTable.append(spark, dir, mkDf(50))
    // resolution now folds checkpoint(v) + one tail delta
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.partCols == Seq("grp"))
    assert(snap.entries.forall(_.part.contains("grp")))
    assert(ManifestTable.read(spark, dir).count() == 350)
    // pruning still exact through the checkpointed snapshot
    val one = spark.read.format("graft-manifest").load(dir)
      .filter(col("grp") === "g0")
    assert(plannedFiles(one) ==
      snap.entries.count(_.part("grp") == "g0"))
    cleanup(dir)
  }

  test("SQL catalog: CREATE TABLE PARTITIONED BY prunes through SQL " +
      "and INSERT OVERWRITE keeps the layout") {
    val cat = s"gpm_${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = java.nio.file.Files
      .createTempDirectory("graft-pmt-cat-").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      mkDf(400).createOrReplaceTempView(s"${cat}_src")
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT, grp STRING, v BIGINT) " +
        "PARTITIONED BY (grp)")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM ${cat}_src")
      val dir = s"$wh/t"
      val snap = ManifestTable.snapshot(spark, dir)
      assert(snap.partCols == Seq("grp"))
      val sel = spark.sql(s"SELECT * FROM $cat.t WHERE grp = 'g1'")
      assert(plannedFiles(sel) == snap.entries.count(_.part("grp") == "g1"))
      assert(sel.count() == 100)
      spark.sql(s"INSERT OVERWRITE $cat.t SELECT * FROM ${cat}_src " +
        "WHERE grp IN ('g0', 'g1')")
      val snap2 = ManifestTable.snapshot(spark, dir)
      assert(snap2.partCols == Seq("grp"))
      assert(snap2.entries.forall(_.part.contains("grp")))
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").first().getLong(0)
        == 200)
    } finally {
      spark.catalog.dropTempView(s"${cat}_src")
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(wh))
    }
  }

  test("a streaming sink into a pre-created partitioned table keeps " +
      "the layout per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = fresh()
    ManifestTable.create(spark, dir,
      Seq((0L, "g0", 0L)).toDF("k", "grp", "v"),
      partitionBy = Seq("grp"))
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-pmt-ck-").toString
    val q = in.toDF().toDF("k", "grp", "v")
      .writeStream.format("graft-manifest")
      .option("path", dir).option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData((1L, "g1", 10L), (2L, "g2", 20L), (3L, "g1", 30L))
      q.processAllAvailable()
      in.addData((4L, "g0", 40L))
      q.processAllAvailable()
    } finally q.stop()
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.partCols == Seq("grp"))
    assert(snap.entries.forall(_.part.contains("grp")))
    assert(ManifestTable.read(spark, dir).count() == 5)
    // pruning exact over the streamed files too
    val one = spark.read.format("graft-manifest").load(dir)
      .filter(col("grp") === "g1")
    assert(plannedFiles(one) ==
      snap.entries.count(_.part("grp") == "g1"))
    assert(one.count() == 2)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    cleanup(dir)
  }

  test("partition values with quotes, spaces and unicode survive the " +
      "log round trip and still prune") {
    import spark.implicits._
    val dir = fresh()
    val weird = Seq("a b", "q\"uote", "némo", "x=y/z")
    val df = (0 until 80).map(i => (i.toLong, weird(i % 4)))
      .toDF("k", "tag")
    ManifestTable.create(spark, dir, df, partitionBy = Seq("tag"))
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.entries.map(_.part("tag")).toSet == weird.toSet)
    val one = spark.read.format("graft-manifest").load(dir)
      .filter(col("tag") === "q\"uote")
    assert(plannedFiles(one) ==
      snap.entries.count(_.part("tag") == "q\"uote"))
    assert(one.count() == 20)
    cleanup(dir)
  }
}
