package graft

import org.apache.spark.sql.functions._

/** Micro-isolation of the iterative-loop storage choices: time reading
  * a ~600k-row 3-long-column frame N times when it is (a) persisted
  * (InMemoryRelation columnar cache), (b) localCheckpointed (RDD
  * blocks), (c) recomputed from a parquet temp file — the three ways
  * a loop-invariant edge list can be held. Prints per-pass wall times.
  */
object CacheMicro {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-cachemicro")
    import spark.implicits._
    val base = spark.range(0L, 600000L, 1L, 32)
      .select(($"id" % 150000L).as("src"),
        ($"id" % 1000L + 1000000000000L).as("dst"),
        ($"id" % 7L + 1L).as("qty"))
    def probe(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.filter($"src" >= 0L)
          .groupBy($"dst").agg(sum($"src").as("s"))
          .selectExpr("sum(s) as t").collect()(0).getLong(0)
        println(f"MICRO $tag pass$i ${(System.nanoTime() - t0) / 1e6}%.0fms n=$n")
      }
    }
    // warm JIT
    probe("warm-noop", base)
    val cached = base.persist()
    cached.count()
    probe("persist", cached)
    cached.unpersist(blocking = true)
    val ckpt = base.localCheckpoint(true)
    probe("localCheckpoint", ckpt)
    val dir = java.nio.file.Files.createTempDirectory("cache-micro-").toString
    base.write.mode("overwrite").parquet(dir)
    probe("parquet", spark.read.parquet(dir))
    // shuffle-write micro: repartition 600k rows by key, 32 partitions
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      base.repartition(32, $"src").selectExpr("count(*) as c").collect()
      println(f"MICRO shuffle pass$i ${(System.nanoTime() - t0) / 1e6}%.0fms")
    }
    spark.stop()
  }
}
