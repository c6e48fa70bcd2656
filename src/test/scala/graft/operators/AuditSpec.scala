package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Audit-rule semantics on deliberately dirty data: predicate NULL
  * handling, uniqueness counting every co-keyed row, FK null-pass.
  */
class AuditSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("rule") ->
      ((r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"),
        r.getAs[Int]("pass")))).toMap

  test("predicate rule: NULL condition is not a violation") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double])](
      (1L, Some(5.0)), (2L, Some(-1.0)), (3L, None)).toDF("id", "bal")
    val m = report(Audit.reportOf(
      Audit.predicateRule("bal_nonneg", df, $"bal" < 0)))
    // row 3's (NULL < 0) is NULL -> not a provable breach
    assert(m("bal_nonneg") === ((3L, 1L, 0)))
  }

  test("unique rule counts every row sharing a key, not the surplus") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L, 2L, 3L, 3L, 4L).toDF("k")
    val m = report(Audit.reportOf(Audit.uniqueRule("k_unique", df, Seq("k"))))
    assert(m("k_unique") === ((7L, 5L, 0))) // 3 twos + 2 threes
  }

  test("fk rule: NULL child keys pass and leave n_checked") {
    import spark.implicits._
    val child = Seq[Option[Long]](Some(1L), Some(1L), Some(9L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val m = report(Audit.reportOf(
      Audit.fkRule("ck_fk", child, "ck", parent, "pk")))
    assert(m("ck_fk") === ((3L, 1L, 0))) // NULL excluded; 9 is orphan
  }

  test("empty table passes everything with zero counts") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "bal")
    val m = report(Audit.reportOf(
      Audit.predicateRule("p", empty, $"bal" < 0),
      Audit.uniqueRule("u", empty, Seq("id")),
      Audit.fkRule("f", empty, "id", Seq(1L).toDF("pk"), "pk")))
    assert(m("p") === ((0L, 0L, 1)))
    assert(m("u") === ((0L, 0L, 1)))
    assert(m("f") === ((0L, 0L, 1)))
  }
}
