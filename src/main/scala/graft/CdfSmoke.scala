package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the round-11 table-format tier: the change-data-feed
  * front door and shallow clone, priced on a 20M-row / 32-file table
  * and printed as one JSON line (SMOKE_cdf_r11.json's generator).
  *
  *   1. FEED INSERT READ: the whole-table feed through
  *      `option("readChangeFeed")` vs the bare table read — the price
  *      of the literal-appending row wrapper (the feed is row-based;
  *      the bare scan is columnar). This is the worst case: a real
  *      incremental consumer reads one version's delta, not history.
  *   2. FEED DELTA READ: after a 0.1% MOR delete, the feed FROM that
  *      version — cost must track the dirty files + deleted rows
  *      (position-diff planning + keep-only cursors), never the table.
  *   3. SHALLOW CLONE: forking the 32-file DV-carrying table — wall
  *      time is O(files) metadata + O(deleted rows) DV rewrite, and
  *      the clone's read must match the source's exactly.
  */
object CdfSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-cdfsmoke")
    import spark.implicits._
    import graft.operators.ManifestTable
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdfsmoke-").toString

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val n = 20000000L
    def base = spark.range(n).select($"id".as("k"),
      pmod(hash($"id"), lit(1000)).cast("long").as("v"),
      concat(lit("payload-"), ($"id" % 97).cast("string"),
        lit("-"), md5($"id".cast("string"))).as("s"))

    val dir = s"$root/t"
    ManifestTable.create(spark, dir, base.repartition(32))

    val (bareRows, bareSec) = timed {
      ManifestTable.read(spark, dir).agg(count(lit(1))).first().getLong(0)
    }
    def feed(fromV: Int) = spark.read.format("graft-manifest")
      .option("readChangeFeed", "true")
      .option("startingVersion", fromV).load(dir)
    val (insertRows, insertSec) = timed {
      feed(1).agg(count(lit(1))).first().getLong(0)
    }
    require(insertRows == bareRows, s"feed != table: $insertRows/$bareRows")

    // the 0.1% point delete, spread over every file — worst case for
    // the position-diff planner (all 32 files go dirty)
    val ((morV, _), _) = timed {
      ManifestTable.deleteRowsMor(spark, dir,
        pmod(hash($"k"), lit(1000)) === 7)
    }
    val (delRows, deltaSec) = timed {
      feed(morV).agg(count(lit(1))).first().getLong(0)
    }

    // localized delete on a range-clustered twin: 1 dirty file of 32 —
    // the delta read must cost ~one file, not the table
    val rngDir = s"$root/rng"
    ManifestTable.create(spark, rngDir, base.repartitionByRange(32, $"k"))
    val (rv, _) = ManifestTable.deleteRowsMor(spark, rngDir, $"k" < 20000L)
    val (rngDelRows, rngDeltaSec) = timed {
      spark.read.format("graft-manifest")
        .option("readChangeFeed", "true").option("startingVersion", rv)
        .load(rngDir).agg(count(lit(1))).first().getLong(0)
    }

    // shallow clone of the DV-carrying 32-file table
    val cloneDir = s"$root/c"
    val (_, cloneSec) = timed {
      ManifestTable.cloneShallow(spark, dir, cloneDir)
    }
    val (cloneRows, cloneReadSec) = timed {
      ManifestTable.read(spark, cloneDir)
        .agg(count(lit(1))).first().getLong(0)
    }
    require(cloneRows == bareRows - delRows,
      s"clone disagrees with source survivors: $cloneRows")

    println(
      s"""{"smoke":"cdf","rows":$n,""" +
      s""""bare_read_sec":${f"$bareSec%.3f"},""" +
      s""""feed_insert_read_sec":${f"$insertSec%.3f"},""" +
      s""""mor_deleted":$delRows,""" +
      s""""feed_delta_read_sec":${f"$deltaSec%.3f"},""" +
      s""""rng_deleted":$rngDelRows,""" +
      s""""feed_delta_localized_sec":${f"$rngDeltaSec%.3f"},""" +
      s""""clone_sec":${f"$cloneSec%.3f"},""" +
      s""""clone_rows":$cloneRows,""" +
      s""""clone_read_sec":${f"$cloneReadSec%.3f"}}""")

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
