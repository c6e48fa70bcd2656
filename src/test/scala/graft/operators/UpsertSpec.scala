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

  test("mergeVersioned: last-writer-wins, order/batching-independent") {
    import spark.implicits._
    // ops for key 1 (v1 'a', v3 'c'), key 2 (v2 'b'), key 3 (v1 'z')
    val ops = Seq((1L, 1L, "a"), (1L, 3L, "c"), (2L, 2L, "b"),
      (3L, 1L, "z")).toDF("k", "ver", "v")
    val empty = ops.limit(0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    val expected = List((1L, 3L, "c"), (2L, 2L, "b"), (3L, 1L, "z"))
    // every batching and arrival order converges to the same state
    val splits = Seq(
      Seq(ops), // one batch
      Seq(ops.filter($"ver" === 3), ops.filter($"ver" =!= 3)), // new first
      Seq(ops.filter($"ver" =!= 3), ops.filter($"ver" === 3)), // new last
      ops.collect().toSeq.reverse.map(r => // one row at a time, reversed
        Seq((r.getLong(0), r.getLong(1), r.getString(2))).toDF("k", "ver", "v")))
    splits.foreach { batches =>
      val state = batches.foldLeft(empty)(
        (t, b) => Upsert.mergeVersioned(t, b, "k", "ver"))
      assert(rows(state) === expected)
    }
  }

  test("mergeVersioned: replay is a no-op; stale and NULL versions lose") {
    import spark.implicits._
    val state0 = Seq((1L, 5L, "new")).toDF("k", "ver", "v")
    // replaying the SAME version must not flap the row (target wins tie)
    val replay = Upsert.mergeVersioned(state0,
      Seq((1L, 5L, "other")).toDF("k", "ver", "v"), "k", "ver")
    assert(replay.collect().head.getString(2) === "new")
    // a late-arriving OLDER version must lose
    val stale = Upsert.mergeVersioned(state0,
      Seq((1L, 2L, "old")).toDF("k", "ver", "v"), "k", "ver")
    assert(stale.collect().head.getString(2) === "new")
    // NULL-versioned rows are malformed and dropped, not inserted
    val nullVer = Upsert.mergeVersioned(state0,
      Seq((Some(9L), None: Option[Long], "bad")).toDF("k", "ver", "v"),
      "k", "ver")
    assert(nullVer.count() === 1L)
  }

  test("mergeActions: delete, update, insert and pass-through in one " +
      "pass; insertValues coverage enforced") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val target = Seq((1L, "a", 100L), (2L, "b", 200L), (3L, "c", 300L),
      (4L, "d", 400L)).toDF("k", "tag", "cents")
    val source = Seq(
      (1L, "R", 0L), // matched + delete condition → row disappears
      (2L, "A", 50L), // matched → update (cents -= 50, tag = M)
      (9L, "I", 900L), // unmatched → insert
      (3L, "A", 1L)) // matched → update
      .toDF("k", "act", "delta")
    val got = Upsert.mergeActions(target, source, "k",
        deleteWhen = col("u.act") === "R",
        updateSet = Map("cents" -> (col("t.cents") - col("u.delta")),
          "tag" -> lit("M")),
        insertValues = Map("k" -> col("u.k"), "tag" -> lit("N"),
          "cents" -> col("u.delta")))
      .orderBy("k")
      .as[(Long, String, Long)].collect().toList
    assert(got === List((2L, "M", 150L), (3L, "M", 299L),
      (4L, "d", 400L), (9L, "N", 900L)))
    intercept[IllegalArgumentException] {
      Upsert.mergeActions(target, source, "k", lit(false),
        Map.empty, Map("k" -> col("u.k"))) // cents/tag uncovered
    }
  }
}
