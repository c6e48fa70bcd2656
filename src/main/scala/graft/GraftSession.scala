package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are tuned for the harness environment (single JVM,
  * `local[32]`, 128 GiB) but every knob here is what we would set on a
  * real multi-executor cluster too: AQE on (runtime re-plan, skew-join
  * splitting, dynamic coalescing of shuffle partitions), shuffle
  * partitions sized to the parallelism actually available instead of
  * the 200 default, and UTC session time so results are reproducible
  * against any oracle.
  */
object GraftSession {

  /** Build (or reuse) a local session. `cpus` controls both the
    * scheduler slots and the shuffle partition count — at 100 TB scale
    * the same code runs with `spark.sql.shuffle.partitions` sized to
    * cluster cores; AQE coalesces small post-shuffle partitions either
    * way.
    */
  def local(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // INT96 timestamps on write: DuckDB (the oracle) reads INT96 as
      // naive local time, matching its own TIMESTAMP literals; the
      // micros logical type would come back timezone-aware and fail
      // the hash compare.
      .config("spark.sql.parquet.outputTimestampType", "INT96")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // native engine functions (graft_hash56, graft_dotl) — same hook
    // a cluster gets via spark.sql.extensions=graft.functions.GraftExtensions
    graft.functions.GraftExtensions.registrations.foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(
          ident, info, builder)
    }
    // custom-operator tier (same hook a cluster gets via
    // spark.sql.extensions): the top-k strategy plans graft's logical
    // nodes; the rewrite rule collapses row_number()<=k windows into
    // them. Guarded for getOrCreate reuse.
    if (!spark.experimental.extraStrategies.contains(graft.plans.GraftStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.GraftStrategy
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RewriteRankLimit))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteRankLimit
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.MatviewRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.MatviewRewrite
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.FkJoinElimination))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.FkJoinElimination
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.EagerAggregation))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.EagerAggregation
    spark
  }
}
