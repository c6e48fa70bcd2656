package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Null semantics and structural edges of the snapshot diff: NULL vs
  * value must read as changed, NULL vs NULL as unchanged (a plain `=`
  * comparison gets both wrong), key-only diffs can never be
  * 'changed', and columns missing from one side are ignored.
  */
class SnapshotDiffSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("null-safe change classification") {
    import spark.implicits._
    val old = Seq(
      (1L, Option("a")),   // unchanged
      (2L, Option("b")),   // changed: value -> NULL
      (3L, None: Option[String]), // changed: NULL -> value
      (4L, None: Option[String]), // unchanged: NULL -> NULL
      (5L, Option("e"))    // removed
    ).toDF("k", "v")
    val neu = Seq(
      (1L, Option("a")),
      (2L, None: Option[String]),
      (3L, Option("c")),
      (4L, None: Option[String]),
      (6L, Option("f"))    // added
    ).toDF("k", "v")
    val got = SnapshotDiff.diff(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "changed", 4L -> "unchanged", 5L -> "removed", 6L -> "added"))
  }

  test("key-only tables never classify as changed") {
    import spark.implicits._
    val old = Seq(1L, 2L).toDF("k")
    val neu = Seq(2L, 3L).toDF("k")
    val got = SnapshotDiff.diff(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "added"))
  }

  test("reserved __-prefixed column names are rejected, not mangled") {
    import spark.implicits._
    val old = Seq((1L, true)).toDF("k", "__old")
    val neu = Seq((1L, false)).toDF("k", "__old")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, neu, Seq("k"))
    }
  }

  test("columns missing from one side are ignored") {
    import spark.implicits._
    val old = Seq((1L, "a", 10)).toDF("k", "v", "old_only")
    val neu = Seq((1L, "a", 99)).toDF("k", "v", "new_only")
    val got = SnapshotDiff.diff(old, neu, Seq("k")).collect()
    assert(got.map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "unchanged"))
  }
}
