package graft.queries

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of the memoized localCheckpointed frames: releaseShared
  * must actually drop the RDD blocks from the block manager (the memo
  * exists BECAUSE `catalog.clearCache()` can't), and a post-release
  * rebuild must reproduce the identical index.
  */
class SharedFramesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def persistedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  private def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(pmod(col("h"), lit(1000003L)))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("Dedup.releaseShared frees blocks; rebuild is identical") {
    // start from a clean slate for this dir
    Dedup.releaseShared(spark, dir)
    val before = persistedCount
    val a = checksum(Dedup.shingleHashes(spark, dir, n = 3))
    assert(persistedCount > before,
      "memoized shingle index should hold checkpoint blocks")
    Dedup.releaseShared(spark, dir)
    assert(persistedCount === before,
      "releaseShared must drop the checkpoint blocks")
    // rebuild from source: same index
    val b = checksum(Dedup.shingleHashes(spark, dir, n = 3))
    assert(a === b)
    assert(a._1 > 0)
    Dedup.releaseShared(spark, dir)
  }

  test("Graphs.releaseShared is idempotent and scoped to its dir") {
    Graphs.releaseShared(spark, dir)
    val before = persistedCount
    // release of a dir with no memo entries must be a no-op
    Graphs.releaseShared(spark, "/no/such/dir")
    assert(persistedCount === before)
    Graphs.releaseShared(spark, dir)
    assert(persistedCount === before)
  }
}
