package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the round-10 table format: the three costs that
  * decide whether the delta-action log survives production commit
  * counts and data volumes, measured head-to-head and printed as one
  * JSON line (SMOKE_manifest_r10.json's generator).
  *
  *   1. COMMIT THROUGHPUT: 200 single-file appends. The delta log
  *      makes each commit O(changed files); the old full-file-list
  *      log would have paid an O(V) manifest body on commit V — at
  *      200 commits that is 20,100 entries written cumulatively vs
  *      200.
  *   2. RESOLUTION: snapshot() at v200 WITH the checkpoint tier
  *      (one parquet + ≤10 tail deltas) vs a forced full-log fold
  *      (what a checkpoint-less reader would do) — the O(1)-vs-O(V)
  *      gap the round's design claims.
  *   3. READ-PATH PARITY: a 20M-row table read through the DSv2
  *      front door (`spark.read.format("graft-manifest")`) vs
  *      `spark.read.parquet` over the same files — the wrapper must
  *      cost nothing beyond the log resolution (same native scan
  *      underneath).
  */
object ManifestSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-msmoke")
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-msmoke-").toString
    val dir = s"$root/t"
    import graft.operators.ManifestTable

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // -- 1. commit throughput: 200 single-file appends ------------------
    val rowsPerCommit = 10000L
    val (_, commitSec) = timed {
      (0 until 200).foreach { i =>
        ManifestTable.append(spark, dir,
          spark.range(i * rowsPerCommit, (i + 1) * rowsPerCommit)
            .select($"id".as("k"),
              pmod(hash($"id"), lit(1000)).cast("long").as("v"))
            .coalesce(1),
          statsCol = Some("k"))
      }
    }
    val commitsPerSec = 200.0 / commitSec

    // -- 2. resolution: checkpoint+tail vs full-log fold -----------------
    require(ManifestTable.checkpointVersions(spark, dir).nonEmpty,
      "checkpoint cadence never fired")
    // warm the FS metadata once so both arms read warm
    ManifestTable.snapshot(spark, dir)
    val (snapA, ckptSec) = timed { ManifestTable.snapshot(spark, dir) }
    // the checkpoint-less arm: resolve v200 with every checkpoint
    // hidden (rename _checkpoints away and back)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ck = new org.apache.hadoop.fs.Path(dir, "_checkpoints")
    val ckHidden = new org.apache.hadoop.fs.Path(dir, "_ckpt_hidden")
    f.rename(ck, ckHidden)
    val (snapB, fullSec) = timed { ManifestTable.snapshot(spark, dir) }
    f.rename(ckHidden, ck)
    require(snapA.entries == snapB.entries && snapA.version == 200,
      "checkpointed and full-fold resolution disagree")

    // -- 3. read-path parity at 20M rows ---------------------------------
    val big = s"$root/big"
    ManifestTable.create(spark, big,
      spark.range(20000000L)
        .select($"id".as("k"),
          pmod(hash($"id"), lit(1000)).cast("long").as("v"))
        .repartition(32), statsCol = Some("k"))
    def aggIt(df: org.apache.spark.sql.DataFrame): Long =
      df.filter($"v" < 500).agg(sum($"k")).first().getLong(0)
    // warm both paths once (page cache parity), then measure
    val paths = ManifestTable.snapshot(spark, big).paths
    aggIt(spark.read.parquet(paths: _*))
    aggIt(spark.read.format("graft-manifest").load(big))
    val (a1, directSec) = timed { aggIt(spark.read.parquet(paths: _*)) }
    val (a2, dsv2Sec) = timed {
      aggIt(spark.read.format("graft-manifest").load(big)) }
    require(a1 == a2, s"DSv2 and direct reads disagree: $a1 vs $a2")

    println(
      s"""{"smoke":"manifest_r10","commits":200,"rows_per_commit":$rowsPerCommit,""" +
      f""""commit_total_sec":$commitSec%.2f,"commits_per_sec":$commitsPerSec%.1f,""" +
      f""""resolve_ckpt_sec":$ckptSec%.4f,"resolve_full_fold_sec":$fullSec%.4f,""" +
      f""""resolve_speedup":${fullSec / ckptSec}%.1f,""" +
      f""""read20m_direct_sec":$directSec%.2f,"read20m_dsv2_sec":$dsv2Sec%.2f,""" +
      f""""dsv2_overhead":${dsv2Sec / directSec}%.3f}""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
