package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle helper for the memoized eagerly-`localCheckpoint`ed
  * frames ([[Dedup]]'s shingle/signature index, [[Graphs]]' edge
  * lists). Checkpoint blocks live at the RDD layer, which
  * `catalog.clearCache()` does not touch — the point of the memo —
  * so without an explicit release a long-lived session scanning many
  * directories grows its block-manager footprint without bound.
  * [[free]] unpersists the blocks behind one memoized frame; the
  * pack objects expose `releaseShared(spark, dir)` built on it,
  * called from Bench/Verify teardown.
  */
private[queries] object SharedFrames {

  /** Unpersist the checkpoint blocks behind an eagerly
    * localCheckpointed frame. After this the frame is NOT
    * recomputable (local checkpoints truncate lineage) — callers
    * must drop every reference (i.e. remove the memo entry first).
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = true)
      case _ => ()
    }

  /** Drop a table LOCATION left behind by a previous session: the
    * catalog is in-memory but the warehouse is on disk, so a stale
    * location is invisible to `tableExists` yet blocks CREATE TABLE
    * AS SELECT. Never adopt the leftover silently — its build
    * provenance is gone; the caller rebuilds. Shared by the
    * persisted-index builders (d17's dedup index, s14's ANN index).
    */
  def dropStaleTableLocation(s: SparkSession, tbl: String): Unit =
    if (!s.catalog.tableExists(tbl)) {
      val p = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), tbl.toLowerCase)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }

  /** Remove-and-free every entry of `memo` whose key matches the
    * current application and `dir` (key shape: (appId, dir, _)).
    */
  def release[K <: Product](
      memo: java.util.concurrent.ConcurrentHashMap[K, DataFrame],
      appId: String, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    memo.keySet.asScala.toSeq
      .filter(k => k.productElement(0) == appId &&
        k.productElement(1) == dir)
      .foreach(k => Option(memo.remove(k)).foreach(free))
  }

  /** Content fingerprint of `dir/table.parquet` (file or directory):
    * a hex hash over the RAW dir string plus every file's
    * (name, length, mtime), sorted. Two jobs that see different
    * source bytes — or the same relative layout under DIFFERENT dirs
    * whose sanitized table-name keys would collide (`/data/sf0.1` vs
    * `/data/sf0_1`) — get different fingerprints. Used as the
    * freshness + identity suffix of every persisted index table
    * name: "does the index for exactly THIS source exist" becomes
    * one catalog lookup, and a regenerated source simply misses and
    * rebuilds (the staleness contract of d17/s14; superseded
    * fingerprints are vacuumed at build time by
    * [[vacuumSuperseded]]).
    */
  def sourceFingerprint(s: SparkSession, dir: String,
      table: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, s"$table.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val b = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      b += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
    }
    val sig = dir + "|" + b.result().sorted.mkString(",")
    f"${scala.util.hashing.MurmurHash3.stringHash(sig) & 0xffffffffL}%08x"
  }

  /** Vacuum superseded persisted-index generations: for each
    * `prefix`, every warehouse location named `${prefix}_<fp>` with
    * `fp != keepFp` is a previous generation of the same (dir,
    * table) index — drop its catalog entry (if this session built
    * it) and delete its location (covers generations left by earlier
    * sessions, whose catalog entries died with their JVM). Called
    * under the builder's lock, before the fresh build, so at any
    * quiescent point at most ONE generation per index exists on
    * disk.
    */
  def vacuumSuperseded(s: SparkSession, prefixes: Seq[String],
      keepFp: String): Unit = {
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(wh)) return
    prefixes.foreach { prefix =>
      val lead = s"${prefix.toLowerCase}_"
      val keep = s"${prefix.toLowerCase}_${keepFp.toLowerCase}"
      fs.listStatus(wh).foreach { st =>
        val name = st.getPath.getName
        // the suffix must be exactly one 8-hex fingerprint: a LONGER
        // sanitized dir key that merely starts with this prefix
        // (".../sf0.1" vs ".../sf0.1_extra") must not be vacuumed
        if (name.startsWith(lead) && name != keep &&
            name.substring(lead.length).matches("[0-9a-f]{8}")) {
          s.sql(s"DROP TABLE IF EXISTS `$name`")
          if (fs.exists(st.getPath)) fs.delete(st.getPath, true)
        }
      }
    }
  }
}
