package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Upsert.merge semantics: whole-row replacement (a NULL in a matched
  * update row means NULL), inserts for unmatched keys, pass-through
  * for untouched rows, and malformed NULL-keyed updates dropped.
  */
class UpsertSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("replace, insert, pass-through, null-field and null-key handling") {
    import spark.implicits._
    val target = Seq(
      (1L, Some("en"), 10.0), (2L, Some("de"), 20.0), (3L, Some("fr"), 30.0))
      .toDF("k", "lang", "score")
    val updates = Seq(
      (Some(2L), None: Option[String], 99.0), // update: clears lang to NULL
      (Some(4L), Some("es"), 40.0), // insert
      (None: Option[Long], Some("xx"), 0.0)) // malformed: dropped
      .toDF("k", "lang", "score")

    val got = Upsert.merge(target, updates, "k")
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)), r.getDouble(2)))
      .toList

    assert(got === List(
      (1L, Some("en"), 10.0), // untouched
      (2L, None, 99.0), // replaced whole-row: lang really becomes NULL
      (3L, Some("fr"), 30.0), // untouched
      (4L, Some("es"), 40.0))) // inserted; NULL-keyed row never appears
  }

  test("guards: schema mismatch and unknown key are rejected eagerly") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "y")).toDF("k", "w")
    intercept[IllegalArgumentException](Upsert.merge(a, b, "k"))
    intercept[IllegalArgumentException](
      Upsert.merge(a, a.toDF("k", "v"), "nope"))
  }
}
