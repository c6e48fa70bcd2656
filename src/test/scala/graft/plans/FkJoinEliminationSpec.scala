package graft.plans

import graft.SparkEntry
import graft.streaming.TestSpark
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Join elimination: x30's plan must contain no customer scan, the
  * eliminated result must equal the joined computation, and shapes
  * the verified facts cannot license (dim columns used, dim-side
  * filter, outer join) must keep their join.
  */
class FkJoinEliminationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def x30 = SparkEntry.queries("x30_join_elimination")(spark, sfDir)

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("x30 eliminates: no customer scan in the physical plan") {
    val plan = planOf(x30)
    assert(!plan.contains("customer.parquet"),
      s"dimension scan survived elimination:\n$plan")
    assert(plan.contains("orders.parquet"))
  }

  test("eliminated result equals the joined computation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.queries.SqlDet.dec
    val eliminated = x30.collect().map(_.toSeq).toSeq
    // defeat elimination with a pass-through dim-side filter — a real
    // dim filter (anything but the inferred IsNotNull(pk)) refuses the
    // rewrite, so this control genuinely executes the join
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val joined = o.join(c.filter($"c_custkey" >= Long.MinValue),
        o("o_custkey") === c("c_custkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec($"o_totalprice")).cast("double").as("revenue"))
      .orderBy($"o_orderpriority")
    assert(planOf(joined).contains("customer.parquet"),
      "control query unexpectedly eliminated — comparison is vacuous")
    assert(eliminated === joined.collect().map(_.toSeq).toSeq)
  }

  test("non-eliminable shapes keep the join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    x30 // ensure the verified join is registered
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    // dim column referenced above the join
    val usesDim = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    assert(planOf(usesDim).contains("customer.parquet"))
    // a REAL dim-side filter could drop matches — never eliminated
    val dimFiltered = o.join(c.filter($"c_acctbal" > 0),
        o("o_custkey") === c("c_custkey"))
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    assert(planOf(dimFiltered).contains("customer.parquet"))
    // outer joins are out of scope for the inner-join identity
    val outer = o.join(c, o("o_custkey") === c("c_custkey"), "left_outer")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    assert(planOf(outer).contains("customer.parquet"))
    // an UNREGISTERED fk pair (orders→nation-sized key) keeps its join
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
    val unregistered = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    assert(planOf(unregistered).contains("nation.parquet"))
  }

  test("fact-side filters do not block elimination (subset preserves " +
      "verified integrity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    x30
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val filteredFact = o.filter($"o_totalprice" > 1000)
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = planOf(filteredFact)
    assert(!plan.contains("customer.parquet"),
      s"fact-side filter blocked elimination:\n$plan")
    val control = o.filter($"o_totalprice" > 1000)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    assert(filteredFact.orderBy($"o_orderpriority").collect().toSeq ===
      control.orderBy($"o_orderpriority").collect().toSeq)
  }
}
