package graft.sources

import graft.streaming.TestSpark
import graft.operators.ManifestTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CALL detail (Delta's DESCRIBE DETAIL) and the streaming sources'
  * startingTimestamp option. */
class DetailTimestampSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag-").toString

  private def cleanup(root: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

  private def seed(from: Long, until: Long) = {
    import spark.implicits._
    (from until until).map(i => (i, i % 7)).toDF("k", "m")
  }

  test("CALL detail reports the snapshot's shape in one row") {
    val cat = s"gdet_${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = fresh("detail")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      import spark.implicits._
      ManifestTable.create(spark, s"$wh/t",
        seed(0, 300).repartition(3), partitionBy = Seq("m"))
      ManifestTable.deleteRowsMor(spark, s"$wh/t", $"m" === 2)
      val r = spark.sql(s"CALL $cat.detail(tbl => 't')").first()
      assert(r.getLong(1) > 0)                 // n_files
      assert(r.getLong(2) > 0)                 // size_bytes
      assert(r.getLong(3) == 300)              // rows
      assert(r.getLong(4) == 300 - 43)         // live_rows (m==2: 43)
      assert(r.getString(5) == "m")            // part_cols
      assert(!r.getBoolean(7))                 // not column-mapped
      assert(r.getInt(9) > 0)                  // dv_files
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      cleanup(wh)
    }
  }

  test("convert adopts plain parquet in place; hive layouts round-trip") {
    import spark.implicits._
    val root = fresh("convert")
    val dir = s"$root/t"
    try {
      seed(0, 250).repartition(2).write.parquet(dir)
      val foreign = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      val v = ManifestTable.convert(spark, dir)
      assert(v == 1)
      val snap = ManifestTable.snapshot(spark, dir)
      assert(snap.rows == 250)
      assert(snap.paths.map(p => new java.io.File(
        ManifestTable.resolvePath(dir, p)).getName).toSet == foreign)
      // a second convert is refused; the table works from here on
      intercept[IllegalArgumentException] {
        ManifestTable.convert(spark, dir)
      }
      ManifestTable.append(spark, dir, seed(250, 300))
      assert(ManifestTable.read(spark, dir).count() == 300)
      // hive-style layout converts in place too (r12): partition
      // values parse from the col=value dir names into the log's
      // per-file tuples, reads fill them per file
      val hive = s"$root/h"
      seed(0, 50).write.partitionBy("m").parquet(hive)
      val hv = ManifestTable.convert(spark, hive)
      assert(hv == 1)
      val hsnap = ManifestTable.snapshot(spark, hive)
      assert(hsnap.hiveDirs && hsnap.partCols == Seq("m"))
      val back = ManifestTable.read(spark, hive)
      assert(back.count() == 50)
      assert(back.columns.contains("m"))
      assert(back.groupBy("m").count().count() ==
        seed(0, 50).select("m").distinct().count())
    } finally cleanup(root)
  }

  test("CALL convert bootstraps the log at the warehouse path") {
    import spark.implicits._
    val cat = s"gcvt_${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = fresh("convcat")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      seed(0, 80).write.parquet(s"$wh/t")
      val r = spark.sql(s"CALL $cat.convert(tbl => 't')").first()
      assert(r.getInt(0) == 1 && r.getLong(2) == 80)
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").first()
        .getLong(0) == 80)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      cleanup(wh)
    }
  }

  test("startingTimestamp admits only commits at or after the mark") {
    import org.apache.spark.sql.streaming.Trigger
    val root = fresh("sts")
    val dir = s"$root/t"
    try {
      ManifestTable.create(spark, dir, seed(0, 100))    // v1
      Thread.sleep(1100)
      val mid = new java.sql.Timestamp(System.currentTimeMillis())
      Thread.sleep(1100)
      ManifestTable.append(spark, dir, seed(100, 150))  // v2
      def drained(opts: Map[String, String]): Long = {
        var n = 0L
        val q = opts.foldLeft(
            spark.readStream.format("graft-manifest"))(
            (r, kv) => r.option(kv._1, kv._2))
          .load(dir)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation",
            s"$root/ckpt-${java.util.UUID.randomUUID()}")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                _: Long) =>
              val c = b.count()
              this.synchronized { n += c }
              ()
          }
          .start()
        q.awaitTermination()
        n
      }
      assert(drained(Map(
        "startingTimestamp" -> mid.toString)) == 50)   // v2 only
      assert(drained(Map(
        "startingTimestamp" -> "1999-01-01 00:00:00")) == 150) // all
      // both knobs together are refused
      val e = intercept[Exception] {
        drained(Map("startingTimestamp" -> mid.toString,
          "startingVersion" -> "1"))
      }
      assert(e.getMessage != null)
    } finally cleanup(root)
  }

  test("hive-converted lifecycle: front-door reads prune on partition " +
      "dirs, appends merge eras, OPTIMIZE materializes and unlocks DML") {
    import spark.implicits._
    val root = fresh("hivecvt")
    val dir = s"$root/t"
    try {
      // a FOREIGN hive-partitioned directory (the common adoption
      // shape): values include one needing canonicalization ('m' is
      // bigint — dir names are Spark-canonical here, but the int cast
      // path is exercised by the type round-trip)
      seed(0, 280).write.partitionBy("m").parquet(dir)
      ManifestTable.convert(spark, dir)
      val snap = ManifestTable.snapshot(spark, dir)
      assert(snap.hiveDirs && snap.partCols == Seq("m"))
      assert(snap.entries.forall(_.part.contains("m")))
      // front door: partition-pruned read — the m=3 predicate plans
      // only that tuple's files
      val probe = spark.read.format("graft-manifest").load(dir)
        .filter($"m" === 3)
      val planned = probe.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b.partitions.size
      }.getOrElse(-1)
      val m3Files = snap.entries.count(_.part("m") == "3")
      assert(planned == m3Files && planned < snap.entries.size,
        s"expected $m3Files planned partitions, got $planned of " +
          s"${snap.entries.size}")
      assert(probe.count() == (0L until 280L).count(_ % 7 == 3))
      assert(probe.agg(sum($"k")).first().getLong(0) ==
        (0L until 280L).filter(_ % 7 == 3).sum)
      // scala-face read agrees
      assert(ManifestTable.read(spark, dir).count() == 280)
      // appends carry the partition columns as data; the read merges
      // the two eras (log-filled hive files + native appended files)
      ManifestTable.append(spark, dir, seed(280, 300))
      assert(ManifestTable.read(spark, dir).count() == 300)
      assert(spark.read.format("graft-manifest").load(dir)
        .filter($"m" === 3).count() ==
        (0L until 300L).count(_ % 7 == 3))
      // DML before materialization is a loud refusal
      val e = intercept[Exception] {
        ManifestTable.deleteRowsMor(spark, dir, $"k" < 10)
      }
      assert(e.getMessage.contains("OPTIMIZE"))
      // OPTIMIZE rewrites every file with the partition columns as
      // data and clears the flag
      ManifestTable.compactCommit(spark, dir, targetBytes = 512L << 20)
      val after = ManifestTable.snapshot(spark, dir)
      assert(!after.hiveDirs)
      assert(ManifestTable.read(spark, dir).count() == 300)
      // ... and DML works from here on
      val (_, nDel) = ManifestTable.deleteRowsMor(spark, dir, $"m" === 3)
      assert(nDel == (0L until 300L).count(_ % 7 == 3))
      assert(ManifestTable.read(spark, dir).count() == 300 - nDel)
      // time travel to v1 still reads the hive era exactly (flag
      // restored per version by the fold)
      assert(ManifestTable.read(spark, dir, Some(1)).count() == 280)
    } finally cleanup(root)
  }
}
