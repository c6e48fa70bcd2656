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

  test("PQ encode matches a brute-force per-subspace argmin model") {
    import spark.implicits._
    val labeled = VectorSearch.quantize(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        "embedding")
      .select($"vec_id".as("id"), $"label",
        posexplode($"eq").as(Seq("dim", "v")))
    val subDims = 16
    val rows = labeled.collect()
      .map(r => (r.getLong(0), r.getAs[Number]("label").longValue(),
        r.getInt(2), r.getLong(3)))
    // model codebook: per (sub, label, dim) floored mean
    val book = rows.groupBy(t => (t._3 / subDims, t._2, t._3))
      .map { case ((sub, code, dim), vs) =>
        (sub, code, dim) ->
          math.floor(vs.map(_._4).sum.toDouble / vs.size).toLong
      }
    val codesByLabel = rows.map(_._2).distinct.sorted
    // model encode: argmin over codes of the sub-distance, tie → low code
    val expected = rows.groupBy(_._1).map { case (id, vs) =>
      id -> (0 until 4).map { sub =>
        codesByLabel.map { code =>
          val d2 = vs.filter(_._3 / subDims == sub)
            .map(t => { val d = t._4 - book((sub, code, t._3)); d * d }).sum
          (d2, code)
        }.min
      }
    }
    val got = VectorSearch.pqEncode(
        labeled.select($"id", $"dim", $"v"),
        VectorSearch.pqCodebook(labeled, subDims), subDims)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).toSeq
          .map(r => (r.getLong(3), r.getLong(2)))
      }
    assert(got === expected)
  }

  test("ADC distance equals the sum of encoded sub-distances") {
    import spark.implicits._
    // self-query sanity: scoring the corpus against ITS OWN lut means
    // adist2(q, n) = Σ_sub lut(q, code_n(sub)) — check one query's
    // top-1 against a hand-summed model
    val labeled = VectorSearch.quantize(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        "embedding")
      .select($"vec_id".as("id"), $"label",
        posexplode($"eq").as(Seq("dim", "v")))
    val book = VectorSearch.pqCodebook(labeled, 16).persist()
    val byDim = labeled.select($"id", $"dim", $"v").persist()
    try {
      val codes = VectorSearch.pqEncode(byDim, book, 16).persist()
      val top = VectorSearch.pqAdcTopK(
          byDim.filter($"id" === 0L), codes, book, 16, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3)))
      assert(top.length === 3)
      assert(top.map(_._3).toSeq === Seq(1, 2, 3))
      // model: lut from query 0's sub-distances × every vector's codes
      val lut = byDim.filter($"id" === 0L)
        .withColumn("sub", ($"dim" / 16).cast("long"))
        .join(broadcast(book), Seq("sub", "dim"))
        .groupBy($"sub", $"code")
        .agg(sum(($"v" - $"cv") * ($"v" - $"cv")).as("d2"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val allScores = codes.filter($"id" =!= 0L).collect()
        .groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.map(r => lut((r.getLong(1), r.getLong(2)))).sum
        }
      val bestModel = allScores.toSeq.sortBy(t => (t._2, t._1)).take(3)
      assert(top.map(t => (t._2, t._4)).toSeq === bestModel)
    } finally { book.unpersist(); byDim.unpersist() }
  }

  test("ivfPqAdcTopK = pqAdcTopK restricted to each query's probed cells") {
    import spark.implicits._
    val labeled = VectorSearch.quantize(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        "embedding")
      .select($"vec_id".as("id"), $"label",
        posexplode($"eq").as(Seq("dim", "v")))
    val byDim = labeled.select($"id", $"dim", $"v").persist()
    val book = VectorSearch.pqCodebook(labeled, 16).persist()
    try {
      val cents = VectorSearch.kmeansQuantized(byDim, k = 4, iters = 3)
      val corpusCells = VectorSearch.nearestCells(byDim, cents, nprobe = 1)
        .select($"id", $"cell")
      val codes = VectorSearch.pqEncode(byDim, book, 16)
        .join(corpusCells, Seq("id")).persist()
      val queries = byDim.filter($"id" < 10)
      val queryCells = VectorSearch.nearestCells(queries, cents, nprobe = 2)
        .select($"id".as("query_id"), $"cell")
      val got = VectorSearch.ivfPqAdcTopK(queries, queryCells, codes,
          book, subDims = 16, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3))).toSet
      // model: the FULL ADC ranking (k ≥ corpus so nothing is cut),
      // kept only where the neighbor's cell is probed by the query,
      // re-ranked per query by (adist2, neighbor_id)
      val model = VectorSearch.pqAdcTopK(queries, codes, book,
          subDims = 16, k = 1000000)
        .join(corpusCells.select($"id".as("neighbor_id"), $"cell"),
          Seq("neighbor_id"))
        .join(queryCells, Seq("query_id", "cell"))
        .select($"query_id", $"neighbor_id", $"adist2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.groupBy(_._1).toSeq.flatMap { case (q, rs) =>
          rs.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
            .map { case ((_, n, d), i) => (q, n, i + 1, d) }
        }.toSet
      assert(got === model)
      assert(got.nonEmpty)
      codes.unpersist()
    } finally { book.unpersist(); byDim.unpersist() }
  }

  test("rangeSearch = threshold filter of the exhaustive ranking " +
      "(window path vs filter path)") {
    import spark.implicits._
    val emb = VectorSearch.quantize(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        "embedding")
      .select($"vec_id", $"eq")
    val q = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"eq".as("qe"))
    val c = emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce"))
    val thr = 250000L
    // k larger than the corpus => the top-k window ranks EVERY pair;
    // its >= thr subset must equal the rangeSearch output exactly
    val viaTopK = VectorSearch.topKBruteForce(q, c, k = 1000)
      .filter($"dot" >= thr)
      .select($"query_id", $"neighbor_id", $"dot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaRange = VectorSearch.rangeSearch(q, c, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaRange === viaTopK)
    assert(viaRange.nonEmpty)
  }

  test("sq8: codes span [0, 255], hit both rails, and reconstruction " +
      "error is bounded by the quantization step") {
    import spark.implicits._
    val vecs = byDim.persist()
    try {
      val stats = VectorSearch.sq8Stats(vecs).persist()
      val codes = VectorSearch.sq8Encode(vecs, stats)
      val range = codes.agg(min($"code"), max($"code"))
        .collect().head
      assert(range.getLong(0) === 0L)
      assert(range.getLong(1) === 255L)
      // every dim's min maps to 0 and max to 255 (non-constant dims)
      val rails = codes.join(vecs, Seq("id", "dim"))
        .join(broadcast(stats), Seq("dim"))
        .filter($"dmax" =!= $"dmin")
        .filter(($"v" === $"dmin" && $"code" =!= 0) ||
          ($"v" === $"dmax" && $"code" =!= 255))
        .count()
      assert(rails === 0L)
      // |v - rv| <= step = ceil(range / 255) for every cell
      val bad = VectorSearch.sq8Recon(codes, stats)
        .join(vecs, Seq("id", "dim"))
        .join(broadcast(stats), Seq("dim"))
        .filter(abs($"v" - $"rv") >
          ($"dmax" - $"dmin" + 254) / 255)
        .count()
      assert(bad === 0L)
      stats.unpersist()
    } finally vecs.unpersist()
  }

  test("sq8 two-tier serve degenerates to exact brute force when the " +
      "candidate tier keeps everything") {
    import spark.implicits._
    val emb = VectorSearch.quantize(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        "embedding")
      .select($"vec_id", $"eq")
    val vecs = byDim.persist()
    try {
      val stats = VectorSearch.sq8Stats(vecs)
      val recon = VectorSearch.sq8Recon(
          VectorSearch.sq8Encode(vecs, stats), stats)
        .groupBy($"id")
        .agg(expr("transform(array_sort(collect_list(struct(dim, rv)))," +
          " x -> x.rv)").as("re"))
      val q = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"eq".as("qe"))
      val n = recon.count()
      // tier 1 with R = corpus size keeps every candidate; the exact
      // re-rank over them must therefore equal plain brute force
      import org.apache.spark.sql.expressions.Window
      val wA = Window.partitionBy($"query_id")
        .orderBy($"dot_a".desc, $"neighbor_id")
      val cand = broadcast(q)
        .join(recon.select($"id".as("neighbor_id"), $"re"),
          $"query_id" =!= $"neighbor_id")
        .withColumn("dot_a", expr("graft_dotl(qe, re)"))
        .withColumn("rk_a", org.apache.spark.sql.functions.row_number()
          .over(wA))
        .filter($"rk_a" <= n)
        .select($"query_id", $"neighbor_id")
      val wE = Window.partitionBy($"query_id")
        .orderBy($"dot".desc, $"neighbor_id")
      val twoTier = cand
        .join(emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")),
          Seq("neighbor_id"))
        .join(broadcast(q), Seq("query_id"))
        .withColumn("dot", expr("graft_dotl(qe, ce)"))
        .withColumn("rank", org.apache.spark.sql.functions.row_number()
          .over(wE))
        .filter($"rank" <= 5)
        .select($"query_id", $"neighbor_id", $"rank", $"dot")
        .orderBy($"query_id", $"rank")
        .collect().toSeq
      val brute = VectorSearch.topKBruteForce(q,
          emb.select($"vec_id".as("neighbor_id"), $"eq".as("ce")), k = 5)
        .orderBy($"query_id", $"rank")
        .collect().toSeq
      assert(twoTier === brute)
      assert(twoTier.nonEmpty)
    } finally vecs.unpersist()
  }
}
