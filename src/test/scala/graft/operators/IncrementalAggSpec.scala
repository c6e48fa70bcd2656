package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental-view-maintenance invariants: merging deltas in ANY
  * batching equals the one-shot aggregate, and a full retraction
  * returns exactly to the prior snapshot.
  */
class IncrementalAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def aggOf(df: DataFrame): DataFrame = {
    import spark.implicits._
    df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
  }

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("merging deltas in any batching equals the one-shot aggregate") {
    import spark.implicits._
    val rows = spark.range(10000)
      .select(($"id" % 37).as("k"), ($"id" % 101).as("v"), $"id")
    val oneShot = aggOf(rows.drop("id"))
    // three uneven batches, merged sequentially
    val batches = Seq(
      rows.filter($"id" % 5 === 0), rows.filter($"id" % 5 === 1),
      rows.filter($"id" % 5 >= 2)).map(df => aggOf(df.drop("id")))
    val merged = batches.reduce(
      IncrementalAgg.mergeAdditive(_, _, Seq("k")))
    assert(same(merged, oneShot))
  }

  test("retraction (negated delta) returns to the prior snapshot; empty groups compact") {
    import spark.implicits._
    val base = spark.range(1000)
      .select(($"id" % 11).as("k"), ($"id" % 7).as("v"))
    val delta = spark.range(50)
      .select(($"id" % 3 + 100).as("k"), lit(1L).as("v"))
    val snap = aggOf(base)
    val grown = IncrementalAgg.mergeAdditive(snap, aggOf(delta), Seq("k"))
    val retract = aggOf(delta)
      .select($"k", ($"n" * -1).as("n"), ($"s" * -1).as("s"))
    val back = IncrementalAgg.mergeAdditive(grown, retract, Seq("k"))
      .filter($"n" > 0)
    assert(same(back, snap))
    // the new-key groups existed before compaction
    assert(IncrementalAgg.mergeAdditive(grown, retract, Seq("k"))
      .filter($"n" === 0).count() === 3L)
  }

  test("NULL-key groups merge across batches (null-safe join)") {
    import spark.implicits._
    val snap = Seq((Some(1L), 5L, 10L), (None, 5L, 10L))
      .toDF("k", "n", "s")
    val delta = Seq((Some(1L), 2L, 4L), (None, 2L, 4L))
      .toDF("k", "n", "s")
    val merged = IncrementalAgg.mergeAdditive(snap, delta, Seq("k"))
    // exactly one NULL-key row, with both contributions summed
    val nullRows = merged.filter($"k".isNull).collect()
    assert(nullRows.length === 1, s"NULL-key group duplicated: $nullRows")
    assert(nullRows(0).getLong(1) === 7L && nullRows(0).getLong(2) === 14L)
    assert(merged.count() === 2L)
  }

  private def monoAggOf(df: DataFrame): DataFrame = {
    import spark.implicits._
    df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"),
      min($"v").as("lo"), max($"v").as("hi"))
  }

  private def monoMerge(a: DataFrame, b: DataFrame): DataFrame =
    IncrementalAgg.mergeMonotonic(a, b, Seq("k"),
      addCols = Seq("n", "s"), minCols = Seq("lo"), maxCols = Seq("hi"))

  test("mergeMonotonic: any batching equals the one-shot aggregate") {
    import spark.implicits._
    val rows = spark.range(10000)
      .select(($"id" % 37).as("k"), ($"id" % 101 - 50).as("v"), $"id")
    val oneShot = monoAggOf(rows.drop("id"))
    val batches = Seq(
      rows.filter($"id" % 5 === 0), rows.filter($"id" % 5 === 1),
      rows.filter($"id" % 5 >= 2)).map(df => monoAggOf(df.drop("id")))
    assert(same(batches.reduce(monoMerge), oneShot))
    // merge order is immaterial too (least/greatest are commutative)
    assert(same(Seq(batches(2), batches(0), batches(1)).reduce(monoMerge),
      oneShot))
    // one-sided groups pass through with their own extrema
    val disjoint = monoAggOf(Seq((999L, 7L)).toDF("k", "v"))
    val grown = monoMerge(oneShot, disjoint)
    val row = grown.filter($"k" === 999L).collect()(0)
    assert(row.getLong(2) === 7L && row.getLong(3) === 7L)
  }

  test("mergeMonotonic: deletes leave a STALE extremum (the documented failure)") {
    import spark.implicits._
    // group's min row (v=1) is later deleted; remaining rows have min 5
    val before = monoAggOf(Seq((1L, 1L), (1L, 5L), (1L, 9L)).toDF("k", "v"))
    val afterDeleteTruth = monoAggOf(Seq((1L, 5L), (1L, 9L)).toDF("k", "v"))
    // the only delta a CDC delete could offer: negated additive parts,
    // extremum columns carrying the deleted value — no spelling of
    // least/greatest can RAISE the min back to 5
    val deleteDelta = Seq((1L, -1L, -1L, 1L, 1L)).toDF("k", "n", "s", "lo", "hi")
    val merged = monoMerge(before, deleteDelta)
    val got = merged.collect()(0)
    val want = afterDeleteTruth.collect()(0)
    // additive parts track the delete fine...
    assert(got.getLong(1) === want.getLong(1) &&
      got.getLong(2) === want.getLong(2))
    // ...but the min is STALE at 1, not the true 5: pinned, so the
    // non-retractability contract is a measured fact, not a comment
    assert(got.getLong(3) === 1L && want.getLong(3) === 5L)
  }

  test("join-view delta decomposition composes with retraction " +
      "(the x27 path): deleting fact rows via a negated delta-join") {
    import spark.implicits._
    val fact = spark.range(2000)
      .select(($"id" % 40).as("k"), ($"id" % 7).as("v"), $"id")
    val dim = spark.range(40).select($"id".as("k"), ($"id" % 5).as("g"))
    def viewOf(f: DataFrame) = f.join(dim, Seq("k"))
      .groupBy($"g").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val v0 = viewOf(fact.drop("id"))
    // CDC delete of a fact slice: the delta term is ΔA⋈B, negated
    val dA = fact.filter($"id" % 9 === 0).drop("id")
    val retract = viewOf(dA).select($"g", (-$"n").as("n"), (-$"s").as("s"))
    val v1 = IncrementalAgg.mergeAdditive(v0, retract, Seq("g"))
      .filter($"n" > 0)
    val truth = viewOf(fact.filter($"id" % 9 =!= 0).drop("id"))
    assert(same(v1, truth))
    assert(v1.count() > 0)
  }

  test("LogHistogram bucket state RECOVERS extrema after their delete " +
      "(the x26 path closing the gap above)") {
    import spark.implicits._
    val K = 16
    def histOf(df: DataFrame, sign: Int) = df
      .withColumn("bucket", LogHistogram.bucket("v", K))
      .groupBy($"k", $"bucket").agg((count(lit(1)) * sign).as("c"))
    val base = Seq((1L, 3L), (1L, 500L), (1L, 90000L)).toDF("k", "v")
    // CDC deletes remove BOTH current extrema; the survivor is 500
    val del = Seq((1L, 3L), (1L, 90000L)).toDF("k", "v")
    val live = IncrementalAgg.mergeAdditive(
      histOf(base, 1), histOf(del, -1), Seq("k", "bucket"))
    val est = LogHistogram.extremaEstimates(live, Seq("k"), K).collect()(0)
    val (minEst, minHi) = (est.getLong(1), est.getLong(2))
    val (maxLo, maxEst) = (est.getLong(3), est.getLong(4))
    // both brackets moved to the surviving value — what mergeMonotonic
    // (previous test) provably cannot do...
    assert(minEst <= 500L && 500L <= minHi, s"min bracket [$minEst,$minHi]")
    assert(maxLo <= 500L && 500L <= maxEst, s"max bracket [$maxLo,$maxEst]")
    // ...and the bracket is one sub-bucket wide: est within (K+1)/K
    assert(minHi * K <= 500L * (K + 1))
    assert(maxEst * K <= 500L * (K + 1))
    // exact values for K=16: 500 lives in octave 8 sub-bucket 15
    assert(minEst === 496L && maxEst === 512L)
  }

  test("mergeMonotonic: declared columns must cover the schema") {
    import spark.implicits._
    val a = Seq((1L, 2L, 3L)).toDF("k", "n", "lo")
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergeMonotonic(a, a, Seq("k"),
        addCols = Seq("n"), minCols = Seq.empty, maxCols = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergeMonotonic(a.select($"k"), a.select($"k"),
        Seq("k"), Seq.empty, Seq.empty, Seq.empty)
    }
  }

  test("schema mismatch and keys-only snapshots are rejected") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("k", "n")
    val b = Seq((1L, 2L)).toDF("k", "other")
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergeAdditive(a, b, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergeAdditive(a.select($"k"), b.select($"k"), Seq("k"))
    }
  }
}
