package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunk-packing invariants: exact token conservation (concat-then-
  * chunk loses and duplicates nothing), correct boundary straddling,
  * and partitioning-independence of the assignment.
  */
class PackingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    // ids 0..99 with deterministic pseudo-random token counts 1..500
    spark.range(100).select($"id".as("doc_id"),
      (abs(hash($"id")) % 500 + 1).cast("long").as("toks"))
  }

  test("every token lands in exactly one pack (conservation per shard)") {
    import spark.implicits._
    val packed = Packing.chunkPack(docs, "doc_id", $"toks",
      budget = 256L, shards = 4, salt = "t")
    // per shard: tok_start of each doc == sum of tokens before it,
    // so max(tok_start + n_tokens) == sum(n_tokens)
    val bad = packed.groupBy($"shard")
      .agg(sum($"n_tokens").as("total"),
        max($"tok_start" + $"n_tokens").as("covered"))
      .filter($"total" =!= $"covered").count()
    assert(bad === 0)
  }

  test("packs_spanned matches the boundary arithmetic") {
    import spark.implicits._
    val packed = Packing.chunkPack(docs, "doc_id", $"toks",
      budget = 256L, shards = 4, salt = "t").collect()
    packed.foreach { r =>
      val start = r.getAs[Long]("tok_start")
      val n = r.getAs[Long]("n_tokens")
      val expected = (start + n - 1) / 256 - start / 256 + 1
      assert(r.getAs[Long]("packs_spanned") === expected, r.toString)
      assert(r.getAs[Long]("pack_id") === start / 256)
    }
  }

  test("pack slices tile every pack exactly (full packs sum to budget)") {
    import spark.implicits._
    val packed = Packing.chunkPack(docs, "doc_id", $"toks",
      budget = 256L, shards = 4, salt = "t")
    val slices = Packing.packSlices(packed, "doc_id", budget = 256L)
    // per pack: slice lengths sum to 256 for every pack except each
    // shard's last, and slices start at pos 0 with no gaps
    val perPack = slices.groupBy($"shard", $"pack_id")
      .agg(sum($"slice_len").as("filled"), min($"pos_in_pack").as("first"),
        max($"pos_in_pack" + $"slice_len").as("end"))
      .collect()
    val lastPack = perPack.groupBy(_.getAs[Long]("shard"))
      .map { case (s, rows) => s -> rows.map(_.getAs[Long]("pack_id")).max }
    perPack.foreach { r =>
      val full = lastPack(r.getAs[Long]("shard")) != r.getAs[Long]("pack_id")
      assert(r.getAs[Long]("first") === 0L, r.toString)
      assert(r.getAs[Long]("end") === r.getAs[Long]("filled"), r.toString)
      if (full) assert(r.getAs[Long]("filled") === 256L, r.toString)
      else assert(r.getAs[Long]("filled") <= 256L, r.toString)
    }
    // token conservation: total sliced == total tokens
    val total = slices.agg(sum($"slice_len")).head().getLong(0)
    val expected = docs.agg(sum($"toks")).head().getLong(0)
    assert(total === expected)
  }

  test("assignment is independent of input partitioning") {
    import spark.implicits._
    val cols = Seq("doc_id", "shard", "n_tokens", "tok_start", "pack_id")
    val a = Packing.chunkPack(docs, "doc_id", $"toks", 256L, 4, "t")
      .select(cols.map(col): _*).orderBy($"doc_id").collect().toSeq
    val b = Packing.chunkPack(docs.repartition(13), "doc_id", $"toks",
        256L, 4, "t")
      .select(cols.map(col): _*).orderBy($"doc_id").collect().toSeq
    assert(a === b)
  }

  test("slidingChunks: known doc, window 3 stride 2") {
    import spark.implicits._
    val d = Seq((1L, Seq("a", "b", "c", "d", "e"))).toDF("doc_id", "toks")
    val got = Packing.slidingChunks(d, "toks", window = 3, stride = 2)
      .orderBy($"chunk_id")
      .select($"chunk_id", $"start_tok", $"n_tok", $"chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(got.toSeq === Seq((0L, 0L, 3L, "a b c"), (1L, 2L, 3L, "c d e"),
      (2L, 4L, 1L, "e")))
  }

  test("slidingChunks: stride = window tiles the doc exactly") {
    import spark.implicits._
    val toks = (0 until 23).map(i => s"t$i")
    val d = Seq((1L, toks)).toDF("doc_id", "toks")
    val chunks = Packing.slidingChunks(d, "toks", window = 8, stride = 8)
      .orderBy($"chunk_id").select($"chunk_text").as[String].collect()
    assert(chunks.mkString(" ") === toks.mkString(" "))
    assert(chunks.length === 3) // ceil(23/8)
  }

  test("slidingChunks: every token covered; full chunks overlap by " +
      "window - stride") {
    import spark.implicits._
    val (window, stride) = (16, 8)
    val d = spark.range(50).select($"id".as("doc_id"),
      expr("transform(sequence(0, CAST(abs(hash(id)) % 40 AS INT)), " +
        "i -> concat('w', i))").as("toks"))
    val chunks = Packing.slidingChunks(d, "toks", window, stride)
    // coverage: max(start + n_tok) per doc == token count, and chunk
    // ids are dense 0..floor((n-1)/stride)
    val bad = chunks.groupBy($"doc_id")
      .agg(max($"start_tok" + $"n_tok").as("covered"),
        max(size($"toks")).as("n"),
        count(lit(1)).as("n_chunks"),
        max($"chunk_id").as("max_id"))
      .filter($"covered" =!= $"n" ||
        $"n_chunks" =!= $"max_id" + 1 ||
        $"n_chunks" =!= floor(($"n" - 1) / stride) + 1)
      .count()
    assert(bad === 0)
    // overlap: consecutive chunks start exactly `stride` apart
    val gaps = chunks.groupBy($"doc_id")
      .agg(countDistinct($"start_tok").as("nd"), count(lit(1)).as("n"),
        max($"start_tok").as("last"))
      .filter($"nd" =!= $"n" || $"last" =!= ($"n" - 1) * stride)
      .count()
    assert(gaps === 0)
  }

  test("greedyPack: no split, no overflow, packs dense and contiguous") {
    import spark.implicits._
    val packed = Packing.greedyPack(docs, "doc_id", $"toks",
      budget = 600L, shards = 4, salt = "g").persist()
    try {
      // no pack overflows the budget unless a single doc does (token
      // counts here are <= 500 < 600, so: never)
      assert(packed.filter($"used_before" + $"n_tokens" > 600L)
        .count() === 0)
      // a doc is never split: every doc appears exactly once
      assert(packed.count() === 100)
      assert(packed.select($"doc_id").distinct().count() === 100)
      // pack ids are dense from 0 per shard
      val dense = packed.groupBy($"shard")
        .agg(max($"pack_id").as("mx"),
          countDistinct($"pack_id").as("nd"))
        .filter($"nd" =!= $"mx" + 1).count()
      assert(dense === 0)
      // next-fit order: within a shard, pack_id is non-decreasing in
      // doc_id (docs in a pack are contiguous in the shard sequence)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"shard").orderBy($"doc_id")
      assert(packed.withColumn("prev",
          lag($"pack_id", 1, 0L).over(w))
        .filter($"pack_id" < $"prev").count() === 0)
    } finally packed.unpersist()
  }

  test("greedyPack is independent of input partitioning") {
    import spark.implicits._
    val cols = Seq("shard", "doc_id", "n_tokens", "pack_id", "used_before")
    val a = Packing.greedyPack(docs, "doc_id", $"toks", 600L, 4, "g")
      .select(cols.map(col): _*).orderBy($"doc_id").collect().toSeq
    val b = Packing.greedyPack(docs.repartition(13), "doc_id", $"toks",
        600L, 4, "g")
      .select(cols.map(col): _*).orderBy($"doc_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("greedyPack: an over-budget doc occupies a pack alone-ish " +
      "(next-fit: it closes the previous pack and overflows its own)") {
    import spark.implicits._
    val d = Seq((1L, 100L), (2L, 900L), (3L, 100L))
      .toDF("doc_id", "toks")
    val got = Packing.greedyPack(d, "doc_id", $"toks",
        budget = 512L, shards = 1, salt = "g")
      .orderBy($"doc_id")
      .select($"doc_id", $"pack_id", $"used_before")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2 doesn't fit after doc 1 -> new pack, overflows it alone;
    // doc 3 doesn't fit after doc 2 -> third pack
    assert(got.toSeq === Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L)))
  }

  test("slidingChunks rejects reserved output columns") {
    import spark.implicits._
    val d = Seq((1L, Seq("a"), 9L)).toDF("doc_id", "toks", "chunk_id")
    val e = intercept[IllegalArgumentException] {
      Packing.slidingChunks(d, "toks", 4, 2)
    }
    assert(e.getMessage.contains("chunk_id"))
  }
}
