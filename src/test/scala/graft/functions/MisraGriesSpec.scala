package graft.functions

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries guarantees under every partitioning: presence of all
  * true heavy hitters, one-sided error ≤ n/k, exactness when the key
  * cardinality fits the summary, and the SQL front door.
  */
class MisraGriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summarize(keys: Seq[Long], k: Int, parts: Int)
      : (Long, Map[Long, Long]) = {
    val row = keys.toDF("key").repartition(parts)
      .agg(MisraGries.summary(col("key"), k).as("s"))
      .select($"s.n", $"s.counters").head()
    (row.getLong(0), row.getMap[Long, Long](1).toMap)
  }

  test("every key with freq > n/k is present; error one-sided ≤ n/k") {
    val rnd = new scala.util.Random(5)
    for (parts <- Seq(1, 3, 8, 32); trial <- 0 until 2) {
      // zipf-ish: key 0 hot, then a long tail
      val keys: Seq[Long] = Seq.fill(2000) {
        val r = rnd.nextInt(100)
        if (r < 40) 0L else if (r < 60) 1L else (2 + rnd.nextInt(400)).toLong
      }
      val k = 10
      val exact = keys.groupBy(identity).map { case (a, b) => a -> b.size.toLong }
      val (n, counters) = summarize(keys, k, parts)
      assert(n === keys.size.toLong)
      exact.foreach { case (key, cnt) =>
        if (cnt * k > n) {
          assert(counters.contains(key),
            s"heavy key $key (cnt=$cnt, n=$n, k=$k) missing at parts=$parts")
        }
      }
      counters.foreach { case (key, est) =>
        val cnt = exact.getOrElse(key, 0L)
        assert(est <= cnt, s"overestimate for $key: est=$est exact=$cnt")
        assert(est * k >= cnt * k - n,
          s"error > n/k for $key: est=$est exact=$cnt n=$n")
      }
    }
  }

  test("cardinality ≤ k−1 is EXACT under any partitioning") {
    val keys: Seq[Long] = (0L until 7L).flatMap(key =>
      Seq.fill((key + 1).toInt * 13)(key))
    for (parts <- Seq(1, 4, 16)) {
      val (n, counters) = summarize(keys, k = 8, parts)
      assert(n === keys.size.toLong)
      (0L until 7L).foreach { key =>
        assert(counters.get(key).contains((key + 1) * 13L),
          s"key $key inexact at parts=$parts: ${counters.get(key)}")
      }
    }
  }

  test("summary buffer stays bounded at k−1 counters") {
    val keys: Seq[Long] = (0L until 5000L)
    val (_, counters) = summarize(keys, k = 16, parts = 8)
    assert(counters.size <= 15, s"${counters.size} counters escaped the cap")
  }

  test("SQL front door: graft_mg_summary resolves and groups") {
    (1L to 100L).map(i => (i % 5, i)).toDF("g", "key")
      .createOrReplaceTempView("mg_in")
    val rows = spark.sql(
      """SELECT g, graft_mg_summary(key, 4).n AS n FROM mg_in
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows.length === 5 && rows.forall(_.getLong(1) === 20L))
  }

  test("Long.MinValue is a legal input key: n exact, key countable") {
    // the buffer carries n OUTSIDE the counter map — a sentinel-key
    // design would double-increment n per MinValue occurrence and
    // never admit the key to the counters
    val keys: Seq[Long] =
      Seq.fill(30)(Long.MinValue) ++ Seq.fill(10)(7L) ++ Seq.fill(3)(9L)
    for (parts <- Seq(1, 4)) {
      val (n, counters) = summarize(keys, k = 8, parts)
      assert(n === 43L, s"n corrupted at parts=$parts: $n")
      assert(counters.get(Long.MinValue).contains(30L),
        s"MinValue miscounted at parts=$parts: ${counters.get(Long.MinValue)}")
      assert(counters.get(7L).contains(10L))
    }
  }

  test("null keys are skipped, not counted") {
    val df = Seq[Option[Long]](Some(1L), None, Some(1L), None, Some(2L))
      .toDF("key")
    val row = df.agg(MisraGries.summary(col("key"), 8).as("s"))
      .select($"s.n", $"s.counters").head()
    assert(row.getLong(0) === 3L)
    assert(row.getMap[Long, Long](1).toMap === Map(1L -> 2L, 2L -> 1L))
  }
}
