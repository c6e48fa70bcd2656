package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition evolution (Iceberg's spec change as a metadata commit)
  * and the streaming source's maxVersionsPerTrigger throttle. */
class PartitionEvolutionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag-").toString

  private def cleanup(root: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

  private def seed(n: Long) = {
    import spark.implicits._
    (0L until n).map(i => (i, (i % 4).toString, i % 100))
      .toDF("k", "p", "v")
  }

  test("evolve is metadata-only; mixed-spec snapshots read and prune " +
      "exactly; Nil resets") {
    import spark.implicits._
    val root = fresh("pevo")
    val dir = s"$root/t"
    try {
      ManifestTable.create(spark, dir, seed(400).filter($"k" < 200)
        .repartition(2))
      val before = ManifestTable.snapshot(spark, dir)
      val v = ManifestTable.evolvePartitioning(spark, dir, Seq("p"))
      val after = ManifestTable.snapshot(spark, dir)
      assert(v == before.version + 1)
      assert(after.paths.toSet == before.paths.toSet) // zero files moved
      assert(after.partCols == Seq("p"))
      ManifestTable.append(spark, dir, seed(400).filter($"k" >= 200))
      val snap = ManifestTable.snapshot(spark, dir)
      assert(snap.entries.exists(_.part.isEmpty) &&
        snap.entries.exists(_.part.contains("p"))) // mixed spec
      // reads across the mix are exact
      val got = ManifestTable.read(spark, dir)
      assert(got.count() == 400)
      assert(got.filter($"p" === "1").count() == 100)
      // evolving back to unpartitioned: later appends record no tuple
      ManifestTable.evolvePartitioning(spark, dir, Nil)
      ManifestTable.append(spark, dir,
        seed(440).filter($"k" >= 400))
      val s3 = ManifestTable.snapshot(spark, dir)
      assert(s3.partCols.isEmpty)
      assert(ManifestTable.read(spark, dir).count() == 440)
      // idempotent: same spec returns the current version, no commit
      val vsBefore = ManifestTable.versions(spark, dir).size
      ManifestTable.evolvePartitioning(spark, dir, Nil)
      assert(ManifestTable.versions(spark, dir).size == vsBefore)
    } finally cleanup(root)
  }

  test("evolve refuses a column the schema does not have") {
    val root = fresh("pevobad")
    val dir = s"$root/t"
    try {
      ManifestTable.create(spark, dir, seed(10))
      val e = intercept[IllegalArgumentException] {
        ManifestTable.evolvePartitioning(spark, dir, Seq("nope"))
      }
      assert(e.getMessage.contains("nope"))
    } finally cleanup(root)
  }

  test("CALL set_partitioning evolves the spec through SQL") {
    val cat = s"gpevo_${java.util.UUID.randomUUID().toString.take(8)}"
    val wh = fresh("pevocat")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      ManifestTable.create(spark, s"$wh/t", seed(100))
      val r = spark.sql(
        s"CALL $cat.set_partitioning(tbl => 't', cols => 'p')").first()
      assert(r.getString(1) == "p")
      assert(ManifestTable.snapshot(spark, s"$wh/t").partCols == Seq("p"))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      cleanup(wh)
    }
  }

  test("maxVersionsPerTrigger=2 drains a 5-version log in 3 batches") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = fresh("throttle")
    val dir = s"$root/t"
    try {
      ManifestTable.create(spark, dir, seed(500).filter($"k" < 100))
      (1 to 4).foreach(i => ManifestTable.append(spark, dir,
        seed(500).filter($"k" >= i * 100 && $"k" < (i + 1) * 100)))
      var batches = 0
      var rows = 0L
      val q = spark.readStream.format("graft-manifest")
        .option("maxVersionsPerTrigger", "2").load(dir)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            val n = b.count()
            this.synchronized {
              if (n > 0) batches += 1
              rows += n
            }
            ()
        }
        .start()
      q.awaitTermination()
      assert(batches == 3) // 2 + 2 + 1 versions
      assert(rows == 500)
    } finally cleanup(root)
  }
}
