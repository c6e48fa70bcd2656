package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the round-10 DML tier: the costs that decide which
  * DELETE a 100 TB table wants, measured head-to-head on a 20M-row /
  * 32-file table and printed as one JSON line (SMOKE_dml_r10.json's
  * generator).
  *
  *   1. MOR vs COW on a POINT DELETE (0.1% of rows, every file
  *      touched): merge-on-read writes the deletion-vector positions
  *      (O(deleted rows)); copy-on-write rewrites every touched file
  *      (O(bytes of the table) when the predicate spreads) — the wall
  *      times AND bytes written are the claim §114 makes.
  *   2. MOR READ TAX: the same aggregate on the DV-carrying table
  *      (broadcast anti-join on _metadata) vs after purge (bare
  *      files) — the price a reader pays between delete and OPTIMIZE.
  *   3. PURGE: rewriting only the dirty files with deletions applied.
  */
object DmlSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-dsmoke")
    import spark.implicits._
    import graft.operators.ManifestTable
    val root = java.nio.file.Files
      .createTempDirectory("graft-dsmoke-").toString

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!f.exists(hp)) 0L else f.getContentSummary(hp).getLength
    }

    val n = 20000000L
    def base = spark.range(n).select($"id".as("k"),
      pmod(hash($"id"), lit(1000)).cast("long").as("v"),
      // a filler column so rewrite cost reflects real row width
      concat(lit("payload-"), ($"id" % 97).cast("string"),
        lit("-"), md5($"id".cast("string"))).as("s"))

    // two identical tables, one per strategy
    val morDir = s"$root/mor"
    val cowDir = s"$root/cow"
    ManifestTable.create(spark, morDir, base.repartition(32))
    ManifestTable.create(spark, cowDir, base.repartition(32))
    val tableBytes = dirBytes(morDir)

    // the point delete: 0.1% of rows, spread over EVERY file
    val pred = pmod(hash($"k"), lit(1000)) === 7

    val (_, morSec) = timed {
      ManifestTable.deleteRowsMor(spark, morDir, pred)
    }
    val morSnap = ManifestTable.snapshot(spark, morDir)
    val dvBytes = morSnap.entries.flatMap(_.dv).distinct.map(dirBytes).sum
    val deleted = morSnap.entries.map(_.dvRows).sum

    val cowBefore = dirBytes(cowDir)
    val (_, cowSec) = timed {
      ManifestTable.mergeCommit(spark, cowDir,
        cur => cur.filter(not(coalesce(pred, lit(false)))))
    }
    val cowBytesWritten = dirBytes(cowDir) - cowBefore // new files only
      // (old files linger until vacuum, so the delta IS the write)

    // read tax: same aggregate through the DV anti-join vs purged
    def agg(dir: String): (Long, Double) = {
      val (r, s) = timed {
        ManifestTable.read(spark, dir)
          .agg(count(lit(1)), sum($"v")).first()
      }
      (r.getLong(0), s)
    }
    val (morRows, morReadSec) = agg(morDir)
    val (_, purgeSec) = timed { ManifestTable.purgeDvs(spark, morDir) }
    val (purgedRows, purgedReadSec) = agg(morDir)
    val (cowRows, cowReadSec) = agg(cowDir)
    require(morRows == purgedRows && morRows == cowRows,
      s"strategies disagree: $morRows / $purgedRows / $cowRows")

    // 4. LOCALIZED delete on a range-clustered table: the predicate
    // touches ~1 of 32 files, so the split read (clean files bare,
    // dirty files anti-joined) must cost ≈ the bare scan — the shape
    // of a GDPR point delete on a date-partitioned 100 TB table
    val rngDir = s"$root/rng"
    ManifestTable.create(spark, rngDir,
      base.repartitionByRange(32, $"k"))
    val (_, rngDelSec) = timed {
      ManifestTable.deleteRowsMor(spark, rngDir, $"k" < 20000L)
    }
    val dirtyFiles = ManifestTable.snapshot(spark, rngDir)
      .entries.count(_.dv.isDefined)
    val (rngRows, rngReadSec) = agg(rngDir)
    require(rngRows == n - 20000L, s"range delete wrong: $rngRows")

    println(
      s"""{"smoke":"dml","rows":$n,"deleted":$deleted,""" +
      s""""table_bytes":$tableBytes,""" +
      s""""mor_delete_sec":${f"$morSec%.3f"},"dv_bytes":$dvBytes,""" +
      s""""cow_delete_sec":${f"$cowSec%.3f"},""" +
      s""""cow_bytes_written":$cowBytesWritten,""" +
      s""""mor_read_sec":${f"$morReadSec%.3f"},""" +
      s""""purged_read_sec":${f"$purgedReadSec%.3f"},""" +
      s""""cow_read_sec":${f"$cowReadSec%.3f"},""" +
      s""""purge_sec":${f"$purgeSec%.3f"},""" +
      s""""rows_after":$morRows,""" +
      s""""rng_delete_sec":${f"$rngDelSec%.3f"},""" +
      s""""rng_dirty_files":$dirtyFiles,""" +
      s""""rng_read_sec":${f"$rngReadSec%.3f"}}""")

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
