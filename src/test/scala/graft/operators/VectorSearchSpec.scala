package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantized k-means invariants: determinism across runs and
  * partitionings, and non-increasing inertia per Lloyd iteration
  * (approximate by design — no SQL oracle, like the x04 sketches).
  */
class VectorSearchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def byDim = {
    import spark.implicits._
    VectorSearch.quantize(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        "embedding")
      .select($"vec_id".as("id"), posexplode($"eq").as(Seq("dim", "v")))
      .select($"id", $"dim", $"v")
  }

  private def inertia(vecs: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame): Long = {
    import spark.implicits._
    vecs.join(broadcast(cents), Seq("dim"))
      .groupBy($"id", $"cell")
      .agg(sum(($"v" - $"cv") * ($"v" - $"cv")).as("dist2"))
      .groupBy($"id").agg(min($"dist2").as("best"))
      .agg(sum($"best")).as[Long].head()
  }

  test("deterministic across runs and partitionings") {
    val a = VectorSearch.kmeansQuantized(byDim, k = 8, iters = 3)
      .orderBy("cell", "dim").collect().toSeq
    val b = VectorSearch.kmeansQuantized(byDim.repartition(13), k = 8,
      iters = 3).orderBy("cell", "dim").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("iters=20 keeps a flat plan (per-round localCheckpoint)") {
    // without the per-round lineage truncation this nests 20 plans and
    // the analyzer/optimizer blows up exponentially — the case would
    // hang, not fail. With it: completes, plan depth is that of ONE
    // round (numberedTreeString of the final frame stays small), and
    // the result is still deterministic.
    val vecs = byDim.persist()
    try {
      val cents = VectorSearch.kmeansQuantized(vecs, k = 4, iters = 20)
      val planLines =
        cents.queryExecution.optimizedPlan.numberedTreeString.linesIterator.size
      assert(planLines < 20, s"expected a truncated plan, got $planLines lines")
      val a = cents.orderBy("cell", "dim").collect().toSeq
      assert(a.nonEmpty)
    } finally vecs.unpersist()
  }

  test("inertia is non-increasing over Lloyd iterations") {
    val vecs = byDim.persist()
    try {
      val inertias = (1 to 3).map(i =>
        inertia(vecs, VectorSearch.kmeansQuantized(vecs, k = 8, iters = i)))
      assert(inertias.zip(inertias.tail).forall { case (prev, next) =>
        // floor-quantization can wobble a centroid by one unit per dim;
        // allow that slack while still catching a broken update step
        next <= prev + vecs.select("dim").distinct().count()
      }, s"inertia not non-increasing: $inertias")
    } finally vecs.unpersist()
  }
}
