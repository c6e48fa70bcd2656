package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV bottom-k sketch invariants: exactness below k, estimator
  * accuracy at k, the superset-rank soundness of the intersection
  * membership test, and exact degeneration of the set-operation
  * estimates when the union fits in the sketch.
  */
class KmvSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val K = 64

  test("distinct estimate is EXACT below k and within 3/sqrt(k) at k") {
    import spark.implicits._
    // group 'small' has 40 < k keys; 'big' has 5000
    val df = spark.range(0, 5000).select(
        lit("big").as("g"), concat(lit("u"), $"id").as("ck"))
      .unionByName(spark.range(0, 40).select(
        lit("small").as("g"), concat(lit("v"), $"id").as("ck")))
    val est = Kmv.estimateDistinct(
      Kmv.sketch(df, Seq("g"), $"ck", K), Seq("g"), K)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("small") === 40L, "below k the sketch IS the set")
    val err = math.abs(est("big") - 5000.0) / 5000.0
    assert(err < 3.0 / math.sqrt(K), s"estimate ${est("big")} off by $err")
  }

  test("sketch never exceeds k rows per group and ranks are bottom-k") {
    import spark.implicits._
    val df = spark.range(0, 2000).select(
      ($"id" % 3).cast("string").as("g"), concat(lit("u"), $"id").as("ck"))
    val sk = Kmv.sketch(df, Seq("g"), $"ck", K)
    assert(sk.groupBy($"g").count().filter($"count" > K).count() === 0L)
    // the k rows per group really are the k smallest hashes: the
    // sketch max is below every non-sketch hash
    val all = df.select($"g",
      graft.queries.PortableHash.sparkHash56($"ck".cast("string")).as("h"))
      .distinct()
    val thresh = sk.groupBy($"g").agg(max($"h").as("kth"))
    val violations = all.join(sk, Seq("g", "h"), "left_anti")
      .join(thresh, Seq("g")).filter($"h" < $"kth")
    assert(violations.count() === 0L)
  }

  test("intersection estimate degenerates to EXACT when union < k") {
    import spark.implicits._
    // A = {0..29}, B = {20..49}: union 50 < k, overlap exactly 10
    val a = spark.range(0, 30).select(lit(1).as("g"),
      concat(lit("u"), $"id").as("ck"))
    val b = spark.range(20, 50).select(lit(1).as("g"),
      concat(lit("u"), $"id").as("ck"))
    val out = Kmv.intersectEstimate(
      Kmv.sketch(a, Seq("g"), $"ck", K),
      Kmv.sketch(b, Seq("g"), $"ck", K), Seq("g"), K).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("kmv_union") === 50L)
    assert(out.head.getAs[Long]("kmv_inter") === 10L)
  }

  test("intersection estimate tracks a 5000-key union with 1000 overlap") {
    import spark.implicits._
    // A = {0..2999}, B = {2000..4999}: union 5000, overlap 1000
    val a = spark.range(0, 3000).select(lit(1).as("g"),
      concat(lit("u"), $"id").as("ck"))
    val b = spark.range(2000, 5000).select(lit(1).as("g"),
      concat(lit("u"), $"id").as("ck"))
    val out = Kmv.intersectEstimate(
      Kmv.sketch(a, Seq("g"), $"ck", K),
      Kmv.sketch(b, Seq("g"), $"ck", K), Seq("g"), K).collect().head
    val u = out.getAs[Long]("kmv_union")
    val i = out.getAs[Long]("kmv_inter")
    assert(math.abs(u - 5000.0) / 5000.0 < 3.0 / math.sqrt(K))
    // the intersection estimator compounds union noise with the
    // rho/k sample fraction (sd ~ sqrt(rho)/k) — allow a loose but
    // meaningful band: rho for J=0.2 is ~13 of 64, sd ~ 3.6
    assert(i > 200 && i < 2500, s"intersection estimate $i wildly off")
  }
}
