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
}
