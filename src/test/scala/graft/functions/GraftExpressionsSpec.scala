package graft.functions

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must be bit-identical to their portable SQL
  * spellings — the DuckDB oracle contract depends on it.
  */
class GraftExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("graft_hash56 == conv(substr(md5(x),1,14),16,10) on varied input") {
    import spark.implicits._
    val df = spark.range(2000).select(
      concat(lit("payload-"), $"id",
        lit(" é中文 "), md5($"id".cast("string"))).as("s"))
    val mismatches = df.select(
      GraftFunctions.hash56($"s").as("native"),
      expr("CAST(conv(substring(md5(s), 1, 14), 16, 10) AS BIGINT)").as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(mismatches === 0)
    // empty string + null behavior
    val edge = Seq(Some(""), None).toDF("s")
      .select(GraftFunctions.hash56($"s").as("h")).collect()
    assert(edge(0).getLong(0) === java.lang.Long.parseLong("d41d8cd98f00b2", 16))
    assert(edge(1).isNullAt(0))
  }

  test("graft_dotl == aggregate(zip_with(...)) and handles SQL registration") {
    import spark.implicits._
    val df = spark.range(500).select(
      expr("transform(sequence(0, 63), i -> CAST(i * id - 17 AS BIGINT))").as("a"),
      expr("transform(sequence(0, 63), i -> CAST((i + 3) * (id % 7) - 5 AS BIGINT))").as("b"))
    val mismatches = df.select(
      GraftFunctions.dotl($"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(mismatches === 0)
    // registered for SQL text too (GraftExtensions path)
    val viaSql = spark.sql(
      "SELECT graft_dotl(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(viaSql === 32L)
    assert(spark.sql("SELECT graft_hash56('hello') AS h").head().getLong(0) ===
      java.lang.Long.parseLong("5d41402abc4b2a", 16))
  }
}
