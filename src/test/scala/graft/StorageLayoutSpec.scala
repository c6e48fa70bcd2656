package graft

import java.nio.file.Files

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-side layout strategies for scale — the storage half of the
  * 100 TB design (SURVEY §2.3 "co-located joins via bucketing",
  * "partition pruning"):
  *
  *   - bucketed tables: both join sides pre-hashed into the same
  *     bucket count on the join key → the sort-merge join reads
  *     co-located buckets with NO shuffle exchange in the plan;
  *   - date-partitioned layout: a predicate on the partition column
  *     prunes directories at planning time — the scan's partition
  *     count, not a post-scan filter, shrinks.
  *
  * Asserted on the physical plan text, not timings, so the checks are
  * scale-independent.
  */
class StorageLayoutSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("bucketed join plans without a shuffle exchange") {
    // (warehouse dir is a static conf — default ./spark-warehouse is fine
    // for these small managed tables; clear leftovers from prior JVMs,
    // whose filesystem locations outlive the in-memory catalog)
    Seq("li_bucketed", "ord_bucketed").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val t = Tables(spark, dir)
    t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucket-co-located join: no exchange feeding the join (only the
    // final single-partition agg exchange may remain)
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"join sides were shuffled:\n$plan")
    // and the result is still right
    val n = joined.agg(sum(col("n"))).head().getLong(0)
    assert(n === Tables(spark, dir).lineitem.count())
  }

  test("partitioned layout prunes partitions at planning time") {
    val out = Files.createTempDirectory("graft-partitioned").toString
    val t = Tables(spark, dir)
    t.orders
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.partitionBy("order_month").mode("overwrite").parquet(out)

    val pruned = spark.read.parquet(out)
      .filter(col("order_month") === "1996-03")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(order_month"),
      s"no partition filter in scan:\n$scan")
    // pruned read returns exactly the month's rows
    val expected = t.orders
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1996-03")
      .count()
    assert(pruned.count() === expected && expected > 0)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at RUNTIME") {
    // Static pruning (test above) needs the predicate ON the partition
    // column. The production shape is a JOIN: the fact is partitioned
    // by month, the filter sits on the dimension, and the months to
    // scan are only known after the dim is evaluated. Spark's DPP
    // plants a dynamicpruning subquery in the scan's PartitionFilters,
    // reusing the broadcast dim — at 100 TB this is the difference
    // between scanning one month and scanning the table.
    val out = Files.createTempDirectory("graft-dpp").toString
    val t = Tables(spark, dir)
    t.orders
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.partitionBy("order_month").mode("overwrite").parquet(out)

    // dim: one row per month with an attribute; the filter selects ONE
    // quarter — on the dim attribute, not the partition column. The dim
    // must be storage-backed: over a LocalRelation the optimizer folds
    // the filter away (ConvertToLocalRelation) before the pruning rule
    // can see a selective predicate, and no DPP subquery is planted.
    import spark.implicits._
    val dimOut = Files.createTempDirectory("graft-dpp-dim").toString
    (1 to 12).map(m => (f"1996-$m%02d", s"fy96q${(m - 1) / 3 + 1}"))
      .toDF("month", "quarter")
      .coalesce(1).write.mode("overwrite").parquet(dimOut)
    val dim = spark.read.parquet(dimOut)
    val fact = spark.read.parquet(out)
    val joined = fact.join(broadcast(dim),
        fact("order_month") === dim("month"))
      .filter(col("quarter") === "fy96q1")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the scan:\n$plan")
    // and the pruned result is exactly the three months' rows
    val expected = t.orders
      .filter(date_format(col("o_orderdate"), "yyyy-MM")
        .isin("1996-01", "1996-02", "1996-03"))
      .count()
    assert(joined.head().getLong(0) === expected && expected > 0)
  }

  test("z-ordered write: a 2-D probe's file footprint beats a 1-D sort") {
    import graft.operators.Zorder
    val t = Tables(spark, dir)
    val mx = t.orders.agg(max(col("o_custkey")).as("mx")).head().getLong(0)
    val z = t.orders
      .select(Zorder.bucket256(col("o_custkey"), lit(mx + 1)).as("bx"),
        Zorder.bucket256(
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")),
          lit(2405)).as("b2"))
      .withColumn("z", Zorder.interleave16(col("bx"), col("b2")))

    // per-file min/max of the two ORIGINAL dims — the footer stats a
    // reader would prune on — under each clustering
    def filesOverlappingProbe(clustered: org.apache.spark.sql.DataFrame)
        : (Long, Long) = {
      val out = Files.createTempDirectory("graft-zorder").toString
      clustered.write.mode("overwrite").parquet(out)
      val stats = spark.read.parquet(out)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("bx")).as("minx"), max(col("bx")).as("maxx"),
          min(col("b2")).as("miny"), max(col("b2")).as("maxy"))
      val total = stats.count()
      val hit = stats.filter(!(col("maxx") < 64 || col("minx") > 95 ||
        col("maxy") < 64 || col("miny") > 95)).count()
      (hit, total)
    }
    val (zHit, zTotal) =
      filesOverlappingProbe(z.repartitionByRange(64, col("z"))
        .sortWithinPartitions(col("z")))
    val (xHit, xTotal) =
      filesOverlappingProbe(z.repartitionByRange(64, col("bx"))
        .sortWithinPartitions(col("bx")))
    // range partitioner may leave a few boundary partitions empty —
    // only written files count
    assert(zTotal >= 32 && xTotal >= 32)
    // z-clustering confines the 32×32 probe to a few curve-contiguous
    // files; the bx-sorted layout can prune on bx but its surviving
    // strip files span every date
    assert(zHit < xHit, s"z-order hit $zHit of $zTotal vs 1-D $xHit")
    assert(zHit <= 4, s"z-order probe footprint too large: $zHit files")
  }
}
