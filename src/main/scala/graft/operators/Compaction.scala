package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the `OPTIMIZE` of Delta/Iceberg-style
  * table maintenance, as a library operator.
  *
  * The 100-TB failure mode this exists for: streaming sinks and
  * per-batch incremental jobs write a file per task per trigger, and
  * a year later the table is millions of kilobyte-scale files. Every
  * reader then pays listing time, one scan task per file (task-launch
  * overhead dwarfs I/O), and footer-per-file metadata — the classic
  * small-files problem. Compaction rewrites many small files into few
  * target-sized ones, changing NOTHING about the rows.
  *
  * Design:
  *   - Planning is DRIVER-SIDE over file METADATA (path, bytes) —
  *     O(#files), never O(rows); this is how every production
  *     compactor plans (file listings are the manifest's job).
  *     Bins are first-fit-decreasing toward `targetBytes`, so every
  *     planned bin's INPUT is ≤ target (single oversized files stay
  *     alone and are left untouched).
  *   - Rewrite is per-bin `read(files...).coalesce(1).write` — a
  *     distributed read collapsed to one output task per bin, NO
  *     shuffle anywhere: compaction moves bytes, it must not pay a
  *     repartition of the table. Bins are independent jobs (submitted
  *     sequentially here; a production run submits them concurrently
  *     — they share no state).
  *   - Swap verifies per-bin row counts (new file vs the bin's
  *     inputs) BEFORE deleting an original byte, then moves the new
  *     files in. A crash between verify and swap leaves originals
  *     intact plus an orphaned `_graft_compact_tmp` dir — re-runnable,
  *     never lossy. (A manifest-committing table format would make
  *     the swap atomic; on a bare directory this is the honest
  *     contract.)
  */
object Compaction {

  final case class FileInfo(path: String, bytes: Long)
  final case class BinPlan(binId: Int, files: Vector[FileInfo]) {
    def bytes: Long = files.map(_.bytes).sum
  }
  final case class CompactStats(
      filesBefore: Long, filesAfter: Long, binsRewritten: Long,
      rowsBefore: Long, rowsAfter: Long, planWithinTarget: Boolean)

  /** Data part-files of a parquet table dir (skips `_`/`.`-prefixed
    * metadata the readers also skip). */
  def listDataFiles(spark: SparkSession, dir: String): Vector[FileInfo] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toVector
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .map(st => FileInfo(st.getPath.toString, st.getLen))
      .sortBy(_.path)
  }

  /** First-fit decreasing over file sizes: deterministic, and every
    * multi-file bin's input total is ≤ `targetBytes` by construction
    * (a file alone larger than target gets its own bin). */
  def planBins(files: Seq[FileInfo], targetBytes: Long): Vector[BinPlan] = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[Vector[FileInfo]]
    files.sortBy(f => (-f.bytes, f.path)).foreach { f =>
      val i = bins.indexWhere(b => b.map(_.bytes).sum + f.bytes <= targetBytes)
      if (i >= 0) bins(i) = bins(i) :+ f
      else bins += Vector(f)
    }
    bins.toVector.zipWithIndex.map { case (fs, i) => BinPlan(i, fs) }
  }

  /** Compact `dir` in place toward `targetBytes` files. Returns stats;
    * rows are verified preserved per bin before any original file is
    * deleted. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long): CompactStats = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(hconf)
    val files = listDataFiles(spark, dir)
    val rowsBefore = spark.read.parquet(dir).count()
    val bins = planBins(files, targetBytes)
    val rewrite = bins.filter(_.files.size >= 2)
    val tmpRoot = new Path(dir, "_graft_compact_tmp")
    fs.delete(tmpRoot, true)

    // rewrite every multi-file bin to ONE file under tmp, verifying
    // its row count against its own inputs before the swap phase
    val staged = rewrite.map { bin =>
      val paths = bin.files.map(_.path)
      val inRows = spark.read.parquet(paths: _*).count()
      val out = new Path(tmpRoot, s"bin${bin.binId}").toString
      spark.read.parquet(paths: _*).coalesce(1)
        .write.mode("overwrite").parquet(out)
      val part = fs.listStatus(new Path(out)).toVector
        .map(_.getPath)
        .find(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"compaction bin ${bin.binId}: no part file"))
      val outRows = spark.read.parquet(part.toString).count()
      require(outRows == inRows,
        s"compaction bin ${bin.binId} would lose rows: $inRows -> $outRows")
      (bin, part)
    }

    // swap: move the verified new file in, then delete the originals
    staged.foreach { case (bin, part) =>
      val dst = new Path(dir, s"compacted-${bin.binId}-${part.getName}")
      require(fs.rename(part, dst), s"rename failed: $part -> $dst")
      bin.files.foreach(f => fs.delete(new Path(f.path), false))
    }
    fs.delete(tmpRoot, true)

    val after = listDataFiles(spark, dir)
    val rowsAfter = spark.read.parquet(dir).count()
    CompactStats(
      filesBefore = files.size, filesAfter = after.size,
      binsRewritten = rewrite.size,
      rowsBefore = rowsBefore, rowsAfter = rowsAfter,
      planWithinTarget =
        rewrite.forall(_.bytes <= targetBytes))
  }
}
