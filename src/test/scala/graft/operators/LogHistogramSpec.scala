package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Log-histogram sketch invariants: the per-value upper-edge bound,
  * merge-by-addition equivalence, and the end-to-end quantile bound
  * exact ≤ est ≤ exact·(k+1)/k on skewed data.
  */
class LogHistogramSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val K = 16

  test("every value's bucket upper edge bounds it within (k+1)/k") {
    import spark.implicits._
    // spans seven octaves, including exact powers of two and the
    // off-by-one edges around them
    val vs = spark.range(1, 200000)
      .select($"id".as("v"))
      .withColumn("bucket", LogHistogram.bucket("v", K))
      .withColumn("ue", LogHistogram.upperEdge("bucket", K))
    assert(vs.filter($"ue" < $"v").count() === 0L, "edge below value")
    assert(vs.filter($"ue" * K > $"v" * (K + 1)).count() === 0L,
      "edge above the (k+1)/k bound")
    // buckets are monotone: a bigger value never gets a smaller bucket
    val inv = vs.select($"v", $"bucket")
      .withColumn("prev", lag($"bucket", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy($"v")))
    assert(inv.filter($"prev" > $"bucket").count() === 0L)
  }

  test("high octaves stay exact — no 64-bit overflow up to 2^62") {
    import spark.implicits._
    // values whose (v - 2^o)·k would wrap a signed 64-bit multiply:
    // the division-first spelling must keep the bound and monotonicity
    // all the way to the documented 2^62 domain edge
    val top = (58 to 61).flatMap { o =>
      val base = 1L << o
      Seq(base, base + 1, base + base / 2, base + base - 1)
    }
    val vs = top.toDF("v")
      .withColumn("bucket", LogHistogram.bucket("v", K))
      .withColumn("ue", LogHistogram.upperEdge("bucket", K))
    val rows = vs.orderBy($"v").collect()
    rows.foreach { r =>
      val (v, b, ue) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(b >= 0L, s"negative bucket for $v")
      assert(ue >= v, s"edge $ue below value $v")
      // (k+1)/k bound via BigInt so the CHECK itself can't overflow
      assert(BigInt(ue) * K <= BigInt(v) * (K + 1),
        s"edge $ue above bound for $v")
    }
    assert(rows.map(_.getLong(1)).sameElements(
      rows.map(_.getLong(1)).sorted), "buckets not monotone in v")
  }

  test("histograms merge by adding counts (day rollup == direct build)") {
    import spark.implicits._
    val rows = spark.range(30000)
      .select(($"id" % 7).as("part"), ($"id" % 9973 + 1).as("v"))
    def histOf(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("bucket", LogHistogram.bucket("v", K))
      .groupBy($"bucket").agg(count(lit(1)).as("c"))
    val direct = histOf(rows.drop("part"))
    val perPart = rows.withColumn("bucket", LogHistogram.bucket("v", K))
      .groupBy($"part", $"bucket").agg(count(lit(1)).as("c"))
      .groupBy($"bucket").agg(sum($"c").as("c"))
    assert(direct.exceptAll(perPart).isEmpty &&
      perPart.exceptAll(direct).isEmpty)
  }

  test("estimated quantiles respect exact <= est <= exact*(k+1)/k") {
    import spark.implicits._
    // zipf-ish skew across groups of different sizes
    val rows = spark.range(1, 50000)
      .select(($"id" % 5).as("g"),
        (($"id" * $"id") % 99991 + 1).cast("long").as("v"))
    val hist = rows.withColumn("bucket", LogHistogram.bucket("v", K))
      .groupBy($"g", $"bucket").agg(count(lit(1)).as("c"))
    val est = LogHistogram.estimateQuantiles(hist, Seq("g"), K,
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v")
    val wn = org.apache.spark.sql.expressions.Window.partitionBy($"g")
    val exact = rows
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy($"g")
      .agg(max(when($"rn" === expr("(n + 1) div 2"), $"v")).as("e50"),
        max(when($"rn" === expr("(9 * n + 9) div 10"), $"v")).as("e90"),
        max(when($"rn" === expr("(99 * n + 99) div 100"), $"v")).as("e99"))
    val bad = est.join(exact, Seq("g")).filter(
      !($"p50" >= $"e50" && $"p50" * K <= $"e50" * (K + 1)) ||
      !($"p90" >= $"e90" && $"p90" * K <= $"e90" * (K + 1)) ||
      !($"p99" >= $"e99" && $"p99" * K <= $"e99" * (K + 1)))
    assert(bad.count() === 0L, bad.collect().mkString("\n"))
  }
}
