package graft.queries

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound checks for the approximate sketches (x04's within-bound
  * booleans, plus a raw-sketch bracket on the tighter published rsd)
  * and a distributed-merge check for the typed UDAF.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("x04 within-bound booleans all hold (the oracle's TRUE claim)") {
    import spark.implicits._
    val rows = Extensions.queries("x04_approx_sketches")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("hll_ok")), s"hll_ok false: $r")
      assert(r.getBoolean(r.fieldIndex("p50_ok")), s"p50_ok false: $r")
      assert(r.getBoolean(r.fieldIndex("p95_ok")), s"p95_ok false: $r")
    }
  }

  test("approx_count_distinct within 3x configured rsd of exact") {
    import spark.implicits._
    val t = graft.Tables(spark, dir).lineitem
    val both = t.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("nd"),
        approx_count_distinct($"l_partkey", 0.02).as("hll"))
      .collect()
    both.foreach { r =>
      val e = r.getLong(1).toDouble
      val a = r.getLong(2)
      assert(math.abs(a - e) / e <= 0.06, // 3× the 2% rsd
        s"HLL for ${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("percentile_approx brackets the exact median") {
    import spark.implicits._
    val p50 = graft.Tables(spark, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(percentile_approx($"l_quantity", lit(0.5), lit(10000))
        .as("p50_qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // quantities are integers 1..50, roughly uniform: the true median
    // sits well inside [20, 30] for every flag at sf0.01
    p50.foreach { case (k, v) =>
      assert(v >= 20 && v <= 30, s"p50 for $k: $v")
    }
  }

  test("x09 CMS never underestimates, for EVERY key (zipf-skewed input)") {
    import spark.implicits._
    import graft.operators.Cms
    // zipf-ish skew: key = floor(sqrt(id)) gives heavy low keys and a
    // long tail — the regime CMS exists for
    val keys = spark.range(50000)
      .select(floor(sqrt($"id".cast("double"))).cast("long").as("k"))
    val cms = Cms.build(keys, $"k", d = 4, w = 256)
    val exact = keys.groupBy($"k").agg(count(lit(1)).as("exact_cnt"))
    val est = Cms.probe(cms, exact, $"k", d = 4, w = 256)
    // the CMS guarantee: est >= exact for every key, no exception
    assert(est.filter($"cms_est" < $"exact_cnt").count() === 0L)
    // and the sketch is actually small: at most d*w cells
    assert(cms.count() <= 4L * 256)
    // sanity: the heaviest key's estimate is within sketch error
    // (eps = e/w of the 50k total) of its true count
    val worst = est.orderBy($"exact_cnt".desc).limit(1).collect()(0)
    assert(worst.getLong(2) - worst.getLong(1) <= (2.72 * 50000 / 256).toLong)
    // keys never seen at build time estimate to at most the collision
    // mass of their cells — and a key whose cells are all empty
    // estimates EXACTLY 0 (left join, not inner: the row must not
    // drop, and a partially-empty cell set must not inflate the min)
    val tiny = Cms.build(Seq(7L).toDF("k"), $"k", d = 4, w = 256)
    val absent = Cms.probe(tiny, Seq(900001L).toDF("k"), $"k",
      d = 4, w = 256).collect()
    assert(absent.length === 1 && absent(0).getLong(1) === 0L,
      s"absent key must estimate 0: ${absent.mkString}")
  }

  test("CMS counts NULL keys like any other key (sentinel bucket)") {
    import spark.implicits._
    import graft.operators.Cms
    // 30 NULL keys among 100 non-null: NULL must estimate >= 30, not 0
    // (cmsBucket hashes NULL via the \u0000-sentinel; a null-propagated
    // bucket would strand the build-side counts in an unjoinable cell)
    val keys = spark.range(130)
      .select(when($"id" < 30, lit(null).cast("long"))
        .otherwise($"id" % 10).as("k"))
    val cms = Cms.build(keys, $"k", d = 4, w = 64)
    assert(cms.filter($"bucket".isNull).count() === 0L,
      "no NULL bucket may exist in the sketch")
    val est = Cms.probe(cms, Seq[Option[Long]](None).toDF("k"), $"k",
      d = 4, w = 64).collect()
    assert(est.length === 1 && est(0).getLong(1) >= 30L,
      s"NULL key seen 30 times must estimate >= 30: ${est.mkString}")
  }

  test("typed UDAF merges partial aggregates correctly across partitions") {
    import spark.implicits._
    // same rows, pathological partitioning: result must be identical
    val t = graft.Tables(spark, dir).lineitem
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
    val base = Extensions.queries("x01_typed_udaf")(spark, dir).collect()
    val wavg = udaf(Extensions.WeightedPriceCents)
    val repart = t.repartition(97)
      .groupBy($"l_returnflag")
      .agg(wavg($"l_extendedprice", $"l_quantity").as("wavg_price_cents"))
      .orderBy($"l_returnflag").collect()
    assert(base.map(_.toString).toList === repart.map(_.toString).toList)
  }
}
