package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling invariants: total partition into splits,
  * stability under repartitioning and data growth, monotone sample
  * nesting, and approximate proportions.
  */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val weights = Seq("train" -> 800, "val" -> 100, "test" -> 100)

  test("every row gets exactly one split, proportions near weights") {
    import spark.implicits._
    val n = 20000L
    val counts = spark.range(n)
      .withColumn("split", Sampling.splitColumn($"id", weights))
      .groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === n)
    assert(counts.keySet === Set("train", "val", "test"))
    // hash is uniform: each split within 10% relative of its weight
    weights.foreach { case (name, pm) =>
      val expected = n * pm / 1000.0
      assert(math.abs(counts(name) - expected) < expected * 0.1,
        s"$name: ${counts(name)} vs ~$expected")
    }
  }

  test("assignment is stable under repartitioning and data growth") {
    import spark.implicits._
    val base = spark.range(5000)
      .withColumn("split", Sampling.splitColumn($"id", weights))
    val repart = spark.range(5000).repartition(17)
      .withColumn("split", Sampling.splitColumn($"id", weights))
    assert(base.exceptAll(repart).isEmpty)
    // growing the dataset never reassigns existing rows
    val grown = spark.range(10000)
      .withColumn("split", Sampling.splitColumn($"id", weights))
      .filter($"id" < 5000)
    assert(base.exceptAll(grown).isEmpty)
  }

  test("samples nest monotonically and are deterministic") {
    import spark.implicits._
    val df = spark.range(10000).toDF("id")
    val s100 = Sampling.sampleByHash(df, col("id"), 100)
    val s300 = Sampling.sampleByHash(df, col("id"), 300)
    assert(s100.exceptAll(s300).isEmpty, "10% sample must nest in 30%")
    assert(s100.count() === Sampling.sampleByHash(df, col("id"), 100).count())
    // different salts decorrelate: split and sample are independent coins
    val viaOtherSalt = Sampling.sampleByHash(df, col("id"), 100, salt = "other")
    assert(viaOtherSalt.count() !== 0L)
    assert(s100.intersect(viaOtherSalt).count() < s100.count())
  }

  test("weights must sum to 1000") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("a" -> 500, "b" -> 400))
    }
  }

  test("null keys get one deterministic bucket (split == sample behavior)") {
    import spark.implicits._
    val df = spark.range(1000)
      .select(when($"id" % 10 === 0, lit(null).cast("long"))
        .otherwise($"id").as("id"))
    // total partition still holds — null keys land in exactly one split
    val counts = df.withColumn("split", Sampling.splitColumn($"id", weights))
      .groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)
    // keep-everything sample keeps the null-key rows too
    assert(Sampling.sampleByHash(df, $"id", 1000).count() === 1000L)
    // and all null keys share one bucket: a sample either keeps all
    // of them or none of them
    val nullKept = Sampling.sampleByHash(df, $"id", 500)
      .filter($"id".isNull).count()
    assert(nullKept === 0L || nullKept === 100L, s"split nulls: $nullKept")
  }

  test("weightedSystematic: exactly k per stratum, weight-proportional") {
    import spark.implicits._
    val df = Seq(
      // stratum a: one heavy row dominating the axis
      ("a", 1L, 1000L), ("a", 2L, 10L), ("a", 3L, 10L),
      // stratum b: uniform weights
      ("b", 1L, 100L), ("b", 2L, 100L), ("b", 3L, 100L), ("b", 4L, 100L)
    ).toDF("s", "id", "w")
    val out = Sampling.weightedSystematic(df, "s", "id", "w", k = 3)
      .select($"s", $"sample_idx", $"id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // each position selects exactly one row → exactly k rows per stratum
    assert(out.count(_._1 == "a") === 3)
    assert(out.count(_._1 == "b") === 3)
    // a's heavy row (≈98% of the axis) takes all three positions
    assert(out.filter(_._1 == "a").map(_._3).toSet === Set(1L))
    // b: midpoints of thirds of [0,400) = 66, 200, 333 → rows 1, 3, 4
    assert(out.filter(_._1 == "b").sortBy(_._2).map(_._3).toSeq ===
      Seq(1L, 3L, 4L))
  }

  test("weightedSystematic: zero-weight rows never selected, repartition-stable") {
    import spark.implicits._
    val df = spark.range(1, 1001)
      .select(($"id" % 7).cast("string").as("s"), $"id",
        when($"id" % 5 === 0, 0L).otherwise($"id" % 50 + 1).as("w"))
    val a = Sampling.weightedSystematic(df, "s", "id", "w", k = 4)
    assert(a.filter($"w" === 0).count() === 0L)
    assert(a.count() === 7L * 4)
    val b = Sampling.weightedSystematic(df.repartition(13), "s", "id", "w", 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("weightedSystematic: duplicate order keys violate the contract LOUDLY") {
    import spark.implicits._
    // two rows tied on `order` share one RANGE-frame cumulative endpoint,
    // so their weight intervals overlap and one position selects both —
    // the documented failure mode for breaking the total-order contract.
    // This pins that the violation is visible (extra rows), not silent.
    val tied = Seq(("a", 1L, 10L), ("a", 1L, 10L)).toDF("s", "id", "w")
    assert(Sampling.weightedSystematic(tied, "s", "id", "w", k = 1)
      .count() === 2L, "tied order keys must surface as >k rows")
    // and a composite unique order restores exactly-k
    val fixed = Seq(("a", "1:0", 10L), ("a", "1:1", 10L)).toDF("s", "id", "w")
    assert(Sampling.weightedSystematic(fixed, "s", "id", "w", k = 1)
      .count() === 1L)
  }

  test("sampleByRate applies per-row rates (domain mixing)") {
    import spark.implicits._
    val df = spark.range(20000)
      .withColumn("domain", ($"id" % 2).cast("int"))
    val rate = when($"domain" === 0, 900).otherwise(100)
    val kept = Sampling.sampleByRate(df, $"id", rate)
      .groupBy($"domain").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // each domain has 10000 rows; keep rates 90% / 10% within 15% rel.
    assert(math.abs(kept(0) - 9000) < 1350, s"domain0: ${kept(0)}")
    assert(math.abs(kept(1) - 1000) < 150, s"domain1: ${kept(1)}")
    // constant rate degenerates to sampleByHash under the same salt
    val a = Sampling.sampleByRate(df, $"id", lit(250), salt = "s")
    val b = Sampling.sampleByHash(df, $"id", 250, salt = "s")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
