package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-index freshness contract (d17's dedup index, s14's
  * ANN index; VERDICT r6 advisory #2): index table names carry a
  * fingerprint of the RAW source dir string plus every source file's
  * (name, length, mtime), so
  *
  *   - an UNCHANGED source provably skips the build — the second
  *     probe reuses the same warehouse generation, asserted on the
  *     location's recursive max mtime;
  *   - a REGENERATED source provably rebuilds — new fingerprint, new
  *     generation, the superseded generation vacuumed (exactly one
  *     generation lives at any quiescent point) — and the persisted
  *     probe re-agrees row-for-row with the in-memory d13 probe on
  *     the NEW corpus, the "row-identical to d13 by construction"
  *     contract that a stale index would break;
  *   - the in-session shingle/signature memos carry the same
  *     fingerprint in their keys, so d13 itself is staleness-proof
  *     WITHOUT any releaseShared call — no quiescent-point protocol
  *     is needed for correctness, only for memory lifecycle.
  */
class FreshnessSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def copyTable(src: String, dst: String, table: String): Unit = {
    Files.createDirectories(Paths.get(dst))
    Files.copy(Paths.get(s"$src/$table.parquet"),
      Paths.get(s"$dst/$table.parquet"),
      StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.COPY_ATTRIBUTES)
  }

  /** Live warehouse generations `${prefix}_<8-hex-fp>`. */
  private def generations(prefix: String): Seq[String] = {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(wh)) Seq.empty
    else fs.listStatus(wh).map(_.getPath.getName)
      .filter(n => n.startsWith(s"${prefix}_") &&
        n.substring(prefix.length + 1).matches("[0-9a-f]{8}"))
      .toSeq.sorted
  }

  private def maxMtime(name: String): Long = {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(wh, true)
    var m = 0L
    while (it.hasNext) m = math.max(m, it.next().getModificationTime)
    m
  }

  private def rows(name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).toSeq

  test("d17: unchanged source skips the build; regenerated source " +
      "rebuilds, vacuums, and re-agrees with d13") {
    val dir = Files.createTempDirectory("graft-fresh-d").toString
    copyTable("/root/testdata/sf0.001", dir, "documents")
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    val bandsPrefix = s"graft_dedup_bands_$key".toLowerCase

    val r1 = rows("d17_persisted_index_dedup", dir)
    val g1 = generations(bandsPrefix)
    assert(g1.size === 1, s"expected one live generation, got $g1")
    val t1 = maxMtime(g1.head)

    // unchanged source → same generation, nothing rewritten
    val r1b = rows("d17_persisted_index_dedup", dir)
    assert(r1b === r1)
    assert(generations(bandsPrefix) === g1,
      "unchanged source must reuse the same index generation")
    assert(maxMtime(g1.head) === t1,
      "unchanged source must not rewrite the index location")

    // regenerate the source in place: drop a third of the docs
    val slim = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 =!= 0)
    slim.coalesce(1).write.parquet(s"$dir/documents_new.parquet")
    val fsPath = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsPath, true)
    fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/documents_new.parquet"), fsPath)

    // NO releaseShared: the fingerprint keys alone must invalidate
    val r2 = rows("d17_persisted_index_dedup", dir)
    val g2 = generations(bandsPrefix)
    assert(g2.size === 1,
      s"superseded generation not vacuumed: $g2")
    assert(g2 !== g1, "regenerated source must produce a new generation")
    assert(r2 !== r1, "mutation should change the probe's result")
    val r2d13 = rows("d13_incremental_dedup", dir)
    assert(r2 === r2d13,
      "persisted probe disagrees with the in-memory d13 probe on the " +
        "regenerated corpus — stale index served")
  }

  test("s14: regenerated embeddings rebuild the ANN index generation") {
    val dir = Files.createTempDirectory("graft-fresh-s").toString
    copyTable("/root/testdata/sf0.001", dir, "embeddings")
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    val codesPrefix = s"graft_ann_codes_$key".toLowerCase

    val r1 = rows("s14_persisted_ann_serving", dir)
    val g1 = generations(codesPrefix)
    assert(g1.size === 1, s"expected one live generation, got $g1")
    val t1 = maxMtime(g1.head)
    assert(rows("s14_persisted_ann_serving", dir) === r1)
    assert(generations(codesPrefix) === g1 && maxMtime(g1.head) === t1,
      "unchanged source must reuse the persisted ANN index")

    val slim = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 =!= 1)
    slim.coalesce(1).write.parquet(s"$dir/embeddings_new.parquet")
    val fsPath = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsPath, true)
    fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/embeddings_new.parquet"), fsPath)

    val r2 = rows("s14_persisted_ann_serving", dir)
    val g2 = generations(codesPrefix)
    assert(g2.size === 1,
      s"superseded ANN generation not vacuumed: $g2")
    assert(g2 !== g1,
      s"regenerated embeddings must supersede the generation: $g1 -> $g2")
    assert(r2 !== r1, "mutation should change the served neighbors")
  }
}
