package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Morton-interleave invariants: the column expression matches a
  * bit-twiddling Scala model, bucketing hits its range edges, and
  * z-blocking actually wins the 2-D pruning game a single-dimension
  * sort loses.
  */
class ZorderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mortonModel(bx: Long, by: Long): Long =
    (0 until 8).foldLeft(0L) { (acc, i) =>
      acc | (((bx >> i) & 1L) << (2 * i + 1)) | (((by >> i) & 1L) << (2 * i))
    }

  test("interleave16 matches the bit-twiddling model on a sample grid") {
    import spark.implicits._
    val pairs = for (a <- 0L to 255L by 17L; b <- 0L to 255L by 13L)
      yield (a, b)
    val got = pairs.toDF("bx", "by")
      .select($"bx", $"by", Zorder.interleave16($"bx", $"by").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === mortonModel(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("interleave16 is a bijection on the full 256×256 grid") {
    import spark.implicits._
    val n = spark.range(65536)
      .select(Zorder.interleave16(($"id" / 256).cast("long"),
        ($"id" % 256).cast("long")).as("z"))
      .agg(countDistinct($"z").as("n"), min($"z").as("lo"), max($"z").as("hi"))
      .head()
    assert(n.getLong(0) === 65536L && n.getLong(1) === 0L &&
      n.getLong(2) === 65535L)
  }

  test("bucket256 maps range edges to 0 and 255, never 256") {
    import spark.implicits._
    val r = Seq(0L, 1L, 2404L).toDF("v")
      .select(Zorder.bucket256($"v", lit(2405)).as("b"))
      .collect().map(_.getLong(0))
    assert(r(0) === 0L && r(2) === 255L && r.forall(b => b >= 0 && b <= 255))
  }

  test("z-blocks prune a 2-D probe rectangle; a 1-D sort cannot") {
    import spark.implicits._
    // full uniform grid → every block's min/max is its exact footprint
    val grid = spark.range(65536)
      .select(($"id" / 256).cast("long").as("bx"),
        ($"id" % 256).cast("long").as("by"))
    def overlapping(blocked: org.apache.spark.sql.DataFrame): Long =
      blocked.groupBy($"block")
        .agg(min($"bx").as("minx"), max($"bx").as("maxx"),
          min($"by").as("miny"), max($"by").as("maxy"))
        .filter(!($"maxx" < 64 || $"minx" > 95 || $"maxy" < 64 || $"miny" > 95))
        .count()
    // 64 z-blocks = an 8×8 grid of 32×32 tiles: the aligned 32×32
    // probe [64,95]² intersects exactly ONE
    val zBlocks = grid.withColumn("block",
      shiftright(Zorder.interleave16($"bx", $"by"), 10))
    assert(overlapping(zBlocks) === 1L)
    // 64 equal slices of the bx-sorted layout: every slice holding
    // the probe's bx strip spans ALL of by — 8 of 64 survive stats
    // pruning, 8× the z-order read
    val sorted1d = grid.withColumn("block", ($"bx" / 4).cast("long"))
    assert(overlapping(sorted1d) === 8L)
  }
}
