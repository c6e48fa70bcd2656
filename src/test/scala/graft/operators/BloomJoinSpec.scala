package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-pruned join must equal the plain join exactly (false
  * positives die in the join), while the pruning predicate alone must
  * actually cut the fact side down to near the matching subset.
  */
class BloomJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("pruned join == plain join") {
    import spark.implicits._
    val fact = spark.range(100000)
      .select(($"id" % 1000).as("k"), $"id".as("payload"))
    // dim keeps 5% of the key space
    val dim = spark.range(1000).filter($"id" % 20 === 0)
      .select($"id".as("dk"), concat(lit("d"), $"id").as("attr"))

    val plain = fact.join(dim, $"k" === $"dk")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
    val pruned = BloomJoin.prunedJoin(fact, dim, "k", "dk",
        expectedKeys = 1024)
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"payload").as("s"))

    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom predicate prunes most non-matching fact rows") {
    import spark.implicits._
    val fact = spark.range(100000)
      .select(($"id" % 1000).as("k"), $"id".as("payload"))
    val dim = spark.range(1000).filter($"id" % 20 === 0)
      .select($"id".as("dk"))
    val kept = BloomJoin.pruneByBloom(fact, dim, "k", "dk",
      expectedKeys = 1024, fpp = 0.01).count()
    // true matches: 50 of 1000 keys → 5000 rows; 1% fpp leaves slack
    assert(kept >= 5000, s"pruned below the true match count: $kept")
    assert(kept < 10000, s"bloom barely pruned: $kept of 100000")
  }

  test("string keys probe the sketch as strings (not cast-to-long)") {
    import spark.implicits._
    val fact = spark.range(5000)
      .select(concat(lit("sku-"), $"id" % 100).as("k"), $"id".as("payload"))
    val dim = spark.range(100).filter($"id" % 10 === 0)
      .select(concat(lit("sku-"), $"id").as("dk"))
    val plain = fact.join(dim, $"k" === $"dk").count()
    val pruned = BloomJoin.prunedJoin(fact, dim, "k", "dk",
      expectedKeys = 256).count()
    assert(plain === 500L && pruned === plain,
      s"string-keyed pruned join lost rows: $pruned vs $plain")
  }

  test("probe is the native expression inside codegen, not a Scala UDF") {
    import spark.implicits._
    val fact = spark.range(1000).select(($"id" % 100).as("k"))
    val dim = spark.range(100).filter($"id" % 10 === 0).select($"id".as("dk"))
    val kept = BloomJoin.pruneByBloom(fact, dim, "k", "dk",
      expectedKeys = 64)
    val physical = kept.queryExecution.executedPlan.toString
    assert(physical.contains("graft_might_contain"),
      s"native probe missing from plan:\n$physical")
    assert(!physical.contains("UDF"),
      s"Scala UDF back in the probe path:\n$physical")
    // and the filter runs inside a whole-stage-codegen span (the
    // simple-string plan marks codegen stages with a `*(n)` prefix)
    assert(physical.linesIterator.exists(l =>
        l.contains("Filter graft_might_contain") && l.contains("*(")),
      s"probe fell out of codegen:\n$physical")
  }

  test("unsupported key types are rejected, not silently mispruned") {
    import spark.implicits._
    val fact = spark.range(10).select(($"id" / 2.0).as("k"))
    val dim = spark.range(5).select(($"id" * 1.0).as("dk"))
    intercept[IllegalArgumentException] {
      BloomJoin.pruneByBloom(fact, dim, "k", "dk")
    }
  }

  test("null fact keys never pass the bloom") {
    import spark.implicits._
    val fact = spark.range(100)
      .select(when($"id" % 2 === 0, $"id" % 10).as("k"))
    val dim = spark.range(10).select($"id".as("dk"))
    val kept = BloomJoin.pruneByBloom(fact, dim, "k", "dk",
      expectedKeys = 64)
    assert(kept.filter($"k".isNull).count() === 0)
  }
}
