package graft

/** Dump formatted physical plans for the named queries (all if none
  * given) — the plan-inspection loop: check filters/projections reach
  * the parquet scan (PushedFilters / ReadSchema), dimension joins
  * broadcast, and no redundant exchanges survive.
  *
  * Usage: runMain graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-explain")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        println(s"\n======== $name ========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"(explain failed: $e)") }
      }
    }
    spark.stop()
  }
}
