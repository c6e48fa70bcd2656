package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-compact-spec-").toString

  test("planBins: FFD keeps multi-file bins within target, oversized alone") {
    val files = Vector(
      Compaction.FileInfo("a", 900), Compaction.FileInfo("b", 400),
      Compaction.FileInfo("c", 300), Compaction.FileInfo("d", 300),
      Compaction.FileInfo("e", 2000)) // oversized: larger than target
    val bins = Compaction.planBins(files, targetBytes = 1000)
    // every multi-file bin within target
    assert(bins.filter(_.files.size >= 2).forall(_.bytes <= 1000))
    // the oversized file sits alone
    assert(bins.exists(b => b.files.map(_.path) == Vector("e")))
    // nothing lost, nothing duplicated
    assert(bins.flatMap(_.files.map(_.path)).sorted ==
      files.map(_.path).sorted)
    // deterministic: same input, same plan
    assert(Compaction.planBins(files, 1000) == bins)
  }

  test("compact: rows and content identical, file count strictly down") {
    import spark.implicits._
    val dir = freshDir()
    val df = (0L until 5000L).map(i => (i, s"v$i", i % 7)).toDF("k", "s", "m")
    df.repartition(20).write.mode("overwrite").parquet(dir)
    assert(Compaction.listDataFiles(spark, dir).size == 20)

    val stats = Compaction.compact(spark, dir, targetBytes = 64L << 20)
    assert(stats.filesBefore == 20 && stats.filesAfter < 20)
    assert(stats.rowsBefore == 5000 && stats.rowsAfter == 5000)
    assert(stats.planWithinTarget)

    // content, not just counts: full-row set equality
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("already-compact table is a no-op: original files untouched") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 100L).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val before = Compaction.listDataFiles(spark, dir)
    val stats = Compaction.compact(spark, dir, targetBytes = 1L << 20)
    assert(stats.binsRewritten == 0)
    assert(Compaction.listDataFiles(spark, dir) == before)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("compact is re-runnable: second pass finds nothing to do") {
    import spark.implicits._
    val dir = freshDir()
    (0L until 2000L).map(i => (i, i * 3)).toDF("a", "b")
      .repartition(10).write.mode("overwrite").parquet(dir)
    val s1 = Compaction.compact(spark, dir, targetBytes = 64L << 20)
    assert(s1.binsRewritten >= 1)
    val s2 = Compaction.compact(spark, dir, targetBytes = 64L << 20)
    assert(s2.binsRewritten == 0 && s2.rowsAfter == 2000)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
