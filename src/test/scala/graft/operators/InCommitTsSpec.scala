package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Laws of IN-COMMIT timestamps (Delta's inCommitTimestamps): the
  * commit time of record is stamped INSIDE the manifest body, so
  * TIMESTAMP AS OF survives relocation / backup-restore / filesystem
  * copies — all of which rewrite file mtimes. */
class InCommitTsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft-ict-").toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  private def historyTs(dir: String): Map[Int, Long] =
    ManifestTable.history(spark, dir)
      .select("version", "commit_ts_ms").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("commit timestamps are strictly monotone even for rapid commits") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, Seq(1L).toDF("k"))
    (2 to 6).foreach(v =>
      ManifestTable.append(spark, dir, Seq(v.toLong).toDF("k")))
    val ts = historyTs(dir).toSeq.sortBy(_._1).map(_._2)
    assert(ts == ts.sorted && ts.distinct.size == ts.size,
      s"not strictly increasing: $ts")
    cleanup(dir)
  }

  test("TIMESTAMP AS OF survives relocation with scrambled mtimes") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 100L).toDF("k"))
    Thread.sleep(30)
    ManifestTable.append(spark, dir, (100L until 250L).toDF("k"))
    val ts = historyTs(dir)
    val mid = (ts(1) + ts(2)) / 2
    assert(ManifestTable.versionAt(spark, dir, mid) == 1)
    // relocate: copy the whole table dir, then scramble every mtime
    // far into the future (what rsync/backup tools do on restore)
    val dst = fresh()
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(dir), new java.io.File(dst))
    val future = System.currentTimeMillis() + 86400000L
    java.nio.file.Files.walk(java.nio.file.Paths.get(dst)).forEach(p =>
      p.toFile.setLastModified(future))
    // the copy still resolves the same version at the same instant
    assert(ManifestTable.versionAt(spark, dst, mid) == 1)
    assert(ManifestTable.read(spark, dst, Some(
      ManifestTable.versionAt(spark, dst, mid))).count() == 100)
    // and history reports the ORIGINAL commit times, not the copy's
    assert(historyTs(dst) == ts)
    cleanup(dir); cleanup(dst)
  }

  test("pre-feature manifests without ts fall back to publish mtime") {
    import spark.implicits._
    val dir = fresh()
    ManifestTable.create(spark, dir, (0L until 10L).toDF("k"))
    ManifestTable.append(spark, dir, (10L until 20L).toDF("k"))
    // strip the in-commit ts from v1's body (a pre-feature manifest)
    val v1 = java.nio.file.Paths.get(dir, "_manifests", "v000001.json")
    val stripped = java.nio.file.Files.readString(v1)
      .replaceFirst(""""ts": \d+, """, "")
    java.nio.file.Files.writeString(v1, stripped)
    assert(ManifestTable.parseManifest(stripped).ts.isEmpty)
    // v1 resolves by mtime, v2 by in-commit ts: pin v1's mtime just
    // before v2's commit time and probe both sides of the boundary
    val ts2 = historyTs(dir)(2)
    v1.toFile.setLastModified(ts2 - 1000)
    assert(ManifestTable.versionAt(spark, dir, ts2) == 2)
    assert(ManifestTable.versionAt(spark, dir, ts2 - 1) == 1)
    cleanup(dir)
  }
}
