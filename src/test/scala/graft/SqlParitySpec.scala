package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** SQL-front-door parity (VERDICT r8 item 5): the query pack is built
  * with the DataFrame API, but a user of the engine ALSO speaks SQL —
  * `spark.sql(...)` must produce hash-identical results, and the
  * licensed optimizer tier (rank-limit → native top-k, matview
  * routing, FK-join elimination, eager aggregation) must fire from
  * SQL text exactly as it does from the DataFrame spelling, because
  * both front doors meet in the same optimizer.
  *
  * The SQL twins reuse the declared DuckDB oracle text verbatim
  * wherever it is ANSI (which is the point of keeping the oracles
  * ANSI); the two DuckDB-isms (quantile_cont, `//`) get Spark
  * spellings here.
  */
class SqlParitySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = graft.streaming.TestSpark.spark

  private def registerViews(): Unit = {
    val t = Tables(spark, sfDir)
    t.lineitem.createOrReplaceTempView("lineitem")
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    t.supplier.createOrReplaceTempView("supplier")
    t.nation.createOrReplaceTempView("nation")
    t.region.createOrReplaceTempView("region")
    t.events.createOrReplaceTempView("events")
  }

  private def fp(df: DataFrame): Seq[String] =
    ClusterParity.fingerprint(df)._2

  /** queries whose ORACLE text runs in Spark unmodified */
  private val verbatim = Seq(
    "q01_pricing_summary", "q03_top_revenue", "q09_segment_top_orders",
    "q12_rollup_acctbal", "q13_cube_status", "q22_pivot",
    "q26_lateral_topk", "q28_null_semantics", "q32_topk_native",
    "x29_matview_route", "x30_join_elimination", "x31_eager_agg",
    "e10_interval_join", "e27_ewma_feature", "e29_peak_concurrency")

  test(s"${verbatim.size} oracle texts run verbatim in Spark and " +
      "hash-match the DataFrame spelling") {
    registerViews()
    val problems = verbatim.flatMap { n =>
      try {
        // DataFrame spelling first: x29/x30/x31 register their
        // matview/licenses as a side effect, exactly as a session
        // that has run the engine's API would be configured
        val viaDf = fp(SparkEntry.queries(n)(spark, sfDir))
        val viaSql = fp(spark.sql(SparkEntry.oracleSql(n)))
        if (viaDf != viaSql) Some(
          s"$n: ${viaDf.size} df rows vs ${viaSql.size} sql; first " +
            s"diff=${viaDf.zipAll(viaSql, "<none>", "<none>")
              .find(p => p._1 != p._2)}")
        else None
      } catch { case e: Throwable =>
        Some(s"$n: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("quantile_cont + recursive-CTE twins (Spark spellings)") {
    registerViews()
    val q24 = fp(spark.sql(
      """SELECT l_returnflag,
        |  percentile(l_quantity, 0.25) AS q1_qty,
        |  percentile(l_quantity, 0.5) AS median_qty,
        |  percentile(l_quantity, 0.75) AS q3_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin))
    assert(q24 == fp(
      SparkEntry.queries("q24_exact_median")(spark, sfDir)))

    val q35 = fp(spark.sql(
      """WITH RECURSIVE up AS (
        |  SELECT c_custkey AS c, c_custkey AS anc,
        |    CAST(0 AS BIGINT) AS depth
        |  FROM customer
        |  UNION ALL
        |  SELECT c, anc DIV 10, depth + 1 FROM up WHERE anc > 0)
        |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(anc) AS BIGINT) AS anc_sum
        |FROM up GROUP BY depth ORDER BY depth""".stripMargin))
    assert(q35 == fp(
      SparkEntry.queries("q35_recursive_cte")(spark, sfDir)))
  }

  test("multi-action MERGE: the SQL relational definition (full-outer " +
      "join + CASE) hash-matches the mergeActions operator") {
    registerViews()
    // the oracle text with DuckDB's // spelled as Spark's DIV
    val viaSql = fp(spark.sql(
      SparkEntry.oracleSql("x34_merge_actions").replace("// 10", "DIV 10")))
    assert(viaSql == fp(
      SparkEntry.queries("x34_merge_actions")(spark, sfDir)))
  }

  test("the d23 window census spelled entirely in SQL text via the " +
      "native generator (LATERAL VIEW graft_packed_windows)") {
    // the SQL front door for substring dedup: the generator and the
    // compiled refinement init are reachable from pure SQL — here the
    // width-8 class table comes from LATERAL VIEW and a census over
    // L=8 windows hash-matches the operator at the same width
    val docs = Tables(spark, sfDir).documents
    docs.createOrReplaceTempView("documents_pw")
    val viaSql = fp(spark.sql(
      """SELECT w.cls AS cls, CAST(COUNT(*) AS BIGINT) AS n_sites,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM documents_pw
        |LATERAL VIEW graft_packed_windows(text) w AS pos, cls
        |WHERE w.pos <= length(text) - 8
        |GROUP BY w.cls HAVING COUNT(*) >= 2""".stripMargin))
    import org.apache.spark.sql.functions._
    val viaApi = fp(docs
      .select(col("doc_id"), length(col("text")).as("len"),
        graft.functions.GraftFunctions.packedWindows(col("text")))
      .filter(col("pos") <= col("len") - 8)
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_sites"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_sites") >= 2))
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty)
  }

  test("the custom optimizer tier fires from SQL text") {
    registerViews()
    // rank-limit rewrite: the row_number()<=k SQL spelling plans
    // through the native top-k exec, same as the DataFrame API
    val topk = spark.sql(SparkEntry.oracleSql("q32_topk_native"))
    assert(topk.queryExecution.executedPlan.toString
      .contains("TopKPerGroup"),
      "RewriteRankLimit did not fire from SQL text")

    // matview routing: after the engine has registered the rollup
    // (DataFrame path), the SQL aggregate routes to the matview scan
    SparkEntry.queries("x29_matview_route")(spark, sfDir).collect()
    val routed = spark.sql(SparkEntry.oracleSql("x29_matview_route"))
    assert(routed.queryExecution.optimizedPlan.toString
      .contains("graft_mv_lineitem"),
      "MatviewRewrite did not route the SQL aggregate")

    // FK-join elimination: the SQL join against customer vanishes
    SparkEntry.queries("x30_join_elimination")(spark, sfDir).collect()
    val elim = spark.sql(SparkEntry.oracleSql("x30_join_elimination"))
    assert(!elim.queryExecution.optimizedPlan.toString
      .contains("customer"),
      "FkJoinElimination did not drop the verified dim join from SQL")

    // eager aggregation: a partial aggregate lands BELOW the join
    SparkEntry.queries("x31_eager_agg")(spark, sfDir).collect()
    val eager = spark.sql(SparkEntry.oracleSql("x31_eager_agg"))
    val plan = eager.queryExecution.optimizedPlan
    val aggsUnderJoin = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.children.flatMap(_.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            => a
        })
    }.flatten
    assert(aggsUnderJoin.nonEmpty,
      "EagerAggregation left no partial aggregate under the SQL join")
  }
}
