package graft

import org.apache.spark.sql.functions._

/** Price the harness' fixed costs: single-stage job latency at 1/8/32
  * tasks, the per-exchange AQE barrier, and codegen-compile cost of a
  * fresh plan — the constants that dominate a 328-query suite of
  * small-SF queries.
  */
object CacheMicro2 {
  def timed(tag: String, reps: Int)(f: => Unit): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    println(f"MICRO2 $tag min=${ts.min}%.0fms med=${ts.sorted.apply(reps / 2)}%.0fms max=${ts.max}%.0fms")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-cachemicro2")
    import spark.implicits._
    val sc = spark.sparkContext
    // raw scheduler latency, no SQL
    timed("rdd-1task", 20)(sc.parallelize(1 to 1, 1).count())
    timed("rdd-32task", 20)(sc.parallelize(1 to 32, 32).count())
    timed("rdd-256task", 10)(sc.parallelize(1 to 256, 256).count())
    // SQL single stage (reused plan)
    val df1 = spark.range(0L, 32L, 1L, 32)
    timed("sql-1stage-reused", 20)(df1.count())
    // SQL with one exchange, AQE on (default session)
    val dfx = spark.range(0L, 100000L, 1L, 32)
      .select(($"id" % 100L).as("k"), $"id".as("v"))
    timed("sql-groupBy-aqe-reused", 20)(
      dfx.groupBy($"k").agg(sum($"v")).selectExpr("count(*)").collect())
    // same with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timed("sql-groupBy-noaqe-reused", 20)(
      dfx.groupBy($"k").agg(sum($"v")).selectExpr("count(*)").collect())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // fresh plan each rep (new literal => new codegen source)
    timed("sql-groupBy-aqe-freshplan", 10) {
      val salt = scala.util.Random.nextInt(1 << 20) + 100L
      spark.range(0L, 100000L, 1L, 32)
        .select(($"id" % salt).as("k"), $"id".as("v"))
        .groupBy($"k").agg(sum($"v")).selectExpr("count(*)").collect()
    }
    // two chained exchanges (join) — AQE barrier count 2
    val dfy = spark.range(0L, 100000L, 1L, 32)
      .select(($"id" % 1000L).as("k"), $"id".as("w"))
    timed("sql-join-aqe-reused", 20)(
      dfx.join(dfy.groupBy($"k").agg(max($"w").as("mw")), "k")
        .selectExpr("count(*)").collect())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timed("sql-join-noaqe-reused", 20)(
      dfx.join(dfy.groupBy($"k").agg(max($"w").as("mw")), "k")
        .selectExpr("count(*)").collect())
    spark.stop()
  }
}
