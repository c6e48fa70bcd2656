package graft.plans

import graft.Tables
import graft.streaming.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Eager aggregation: the licensed rollup must carry its partial
  * aggregate below the join AND equal the unrewritten computation
  * row-for-row; shapes the rewrite cannot prove exact (DISTINCT,
  * non-decomposable functions, outer joins, dim-side aggregate
  * inputs) must be left alone.
  */
class EagerAggregationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val lic =
    EagerAggFact(s"$sfDir/lineitem.parquet", "l_suppkey")

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  private def rollup(aggs: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val s = spark
    import s.implicits._
    val li = Tables(s, sfDir).lineitem
    val su = Tables(s, sfDir).supplier
    li.join(su, li("l_suppkey") === su("s_suppkey"))
      .groupBy($"s_nationkey")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy($"s_nationkey")
  }

  private val s = spark
  import s.implicits._

  private def stdAggs = Seq(
    count(lit(1)).as("n"),
    sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sq"),
    min($"l_extendedprice").as("mn"),
    max($"l_extendedprice").as("mx"))

  test("licensed rollup rewrites and equals the unrewritten result") {
    EagerAggregation.clear()
    val base = rollup(stdAggs).collect().toSeq
    EagerAggregation.register(lic)
    val df = rollup(stdAggs)
    assert(planOf(df).contains("geag_"), "rewrite did not fire")
    assert(df.collect().toSeq == base,
      "eager-aggregated result diverges from the plain rollup")
  }

  test("grouping by a fact-side column too stays exact") {
    EagerAggregation.clear()
    val q = { () =>
      val li = Tables(s, sfDir).lineitem
      val su = Tables(s, sfDir).supplier
      li.join(su, li("l_suppkey") === su("s_suppkey"))
        .groupBy($"s_nationkey", $"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sq"))
        .orderBy($"s_nationkey", $"l_returnflag")
    }
    val base = q().collect().toSeq
    EagerAggregation.register(lic)
    val df = q()
    assert(planOf(df).contains("geag_"))
    assert(df.collect().toSeq == base)
  }

  test("type-coerced join keys (cast around the key) still rewrite " +
      "exactly") {
    EagerAggregation.clear()
    def q() = {
      val li = Tables(s, sfDir).lineitem
      // int dim key against the bigint fk — analysis wraps one side
      // in a Cast; the partial aggregate must key on the RAW column
      val dim = s.range(100)
        .select($"id".cast("int").as("k"),
          pmod($"id", lit(7)).as("grp"))
      li.join(dim, li("l_suppkey") === dim("k"))
        .groupBy($"grp")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sq"))
        .orderBy($"grp")
    }
    val base = q().collect().toSeq
    EagerAggregation.register(lic)
    val df = q()
    assert(planOf(df).contains("geag_"),
      "cast-wrapped key refused the rewrite")
    assert(df.collect().toSeq == base)
  }

  test("DISTINCT aggregate refuses the rewrite") {
    EagerAggregation.register(lic)
    val df = rollup(Seq(countDistinct($"l_partkey").as("d")))
    assert(!planOf(df).contains("geag_"),
      "count(DISTINCT) is not decomposable over partials keyed by fk")
  }

  test("avg refuses the rewrite (not a single decomposable function)") {
    EagerAggregation.register(lic)
    val df = rollup(Seq(avg($"l_quantity").as("a")))
    assert(!planOf(df).contains("geag_"))
  }

  test("outer join refuses the rewrite") {
    EagerAggregation.register(lic)
    val li = Tables(s, sfDir).lineitem
    val su = Tables(s, sfDir).supplier
    val df = li.join(su, li("l_suppkey") === su("s_suppkey"), "left_outer")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n"))
    assert(!planOf(df).contains("geag_"),
      "left-outer multiplicities are not constant per key group")
  }

  test("dim-side aggregate input refuses the rewrite") {
    EagerAggregation.register(lic)
    val df = rollup(Seq(
      sum($"s_acctbal".cast("decimal(18,2)")).cast("double").as("sb")))
    assert(!planOf(df).contains("geag_"),
      "an aggregate reading the dimension cannot be pushed to the fact")
  }

  test("global COUNT over a join with zero matching rows stays 0") {
    // empty groupingExpressions pass the rewrite gate, and the final
    // aggregate is then global: one output row even over an empty
    // join. COUNT merged as SUM(partial counts) over that empty input
    // is NULL unless coalesced — the silent-wrong-result shape.
    EagerAggregation.clear()
    EagerAggregation.register(lic)
    def q(matching: Boolean) = {
      val li = Tables(s, sfDir).lineitem
      // no supplier key is negative → the !matching join is empty
      val dim = s.range(100).select(
        (if (matching) $"id" else -$"id" - 1).as("k"))
      li.join(dim, li("l_suppkey") === dim("k"))
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sq"))
    }
    val rewritten = q(matching = false)
    assert(planOf(rewritten).contains("geag_"),
      "global aggregate should still be licensed to rewrite")
    val row = rewritten.collect().head
    assert(!row.isNullAt(0) && row.getLong(0) == 0L,
      "global COUNT over an empty join must be 0, not NULL")
    assert(row.isNullAt(1), "SUM over empty input is NULL in both spellings")
    // and the non-empty global case still matches the plain spelling
    EagerAggregation.clear()
    val base = q(matching = true).collect().toSeq
    EagerAggregation.register(lic)
    assert(q(matching = true).collect().toSeq == base)
  }
}
