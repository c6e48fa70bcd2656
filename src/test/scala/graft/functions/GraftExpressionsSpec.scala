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

  test("graft_max_codepoint: compiled check matches the HOF spelling") {
    import spark.implicits._
    val df = Seq("abc", "", "Zz 09~", "café", "中文", "a0")
      .toDF("s")
    val bad = df.select(
      GraftFunctions.maxCodePoint($"s").as("native"),
      expr("coalesce(array_max(transform(split(s, '(?!^)'), " +
        "ch -> ascii(ch))), 0)").as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(bad === 0)
    // null in, null out; SQL door works
    assert(Seq(Option.empty[String]).toDF("s")
      .select(GraftFunctions.maxCodePoint($"s")).head().isNullAt(0))
    assert(spark.sql("SELECT graft_max_codepoint('abc') AS m")
      .head().getInt(0) === 99)
  }

  test("graft_packed_windows: generator rows == the HOF packing, SQL door") {
    import spark.implicits._
    val docs = Seq((0L, "the quick brown fox"), (1L, "ababab"),
      (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val viaGen = docs
      .select($"doc_id", GraftFunctions.packedWindows($"text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // reference spelling: split leaves a phantom trailing '' fragment
    // (the generator has no such artifact), so filter empties first
    val viaHof = docs
      .filter(length($"text") > 0)
      .select($"doc_id",
        expr("transform(filter(split(text, '(?!^)'), ch -> ch != ''), " +
          "ch -> ascii(ch) + 1)").as("codes"))
      .select($"doc_id",
        posexplode(expr(
          """transform(sequence(0, size(codes) - 1), p ->
            |  aggregate(sequence(p, p + 7), CAST(0 AS BIGINT),
            |    (acc, j) -> acc * 129L + CASE WHEN j < size(codes)
            |      THEN CAST(element_at(codes, j + 1) AS BIGINT)
            |      ELSE 0L END))""".stripMargin))
          .as(Seq("pos", "cls")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaGen === viaHof)
    // empty string emits no rows (the HOF spelling emits a phantom)
    assert(!viaGen.exists(_._1 == 3L))
    // LATERAL VIEW from SQL text
    docs.createOrReplaceTempView("pw_docs")
    val n = spark.sql(
      """SELECT doc_id, pw.pos, pw.cls FROM pw_docs
        |LATERAL VIEW graft_packed_windows(text) pw AS pos, cls""".stripMargin)
      .count()
    assert(n === viaGen.size)
    // single-byte contract: a >127 code point refuses loudly
    val e = intercept[org.apache.spark.SparkException] {
      Seq("café").toDF("text")
        .select(GraftFunctions.packedWindows($"text")).collect()
    }
    assert(e.getMessage.contains("graft_packed_windows") ||
      Option(e.getCause).exists(_.getMessage.contains("code point")))
  }
}
