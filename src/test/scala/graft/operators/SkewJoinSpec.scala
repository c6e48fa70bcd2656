package graft.operators

import graft.streaming.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join equals the plain join on pathological skew (90% of the
  * probe side on one key) and actually spreads the hot key across
  * salt groups.
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("salted join == plain join under heavy skew") {
    import spark.implicits._
    // 100k rows, 90% on key 7
    val skewed = spark.range(100000)
      .select(when($"id" % 10 =!= 0, 7L).otherwise($"id" % 100).as("k"),
        $"id".as("payload"))
    val build = spark.range(100).select($"id".as("k"),
      concat(lit("dim-"), $"id").as("attr"))

    val plain = skewed.join(build, Seq("k"))
      .groupBy($"k", $"attr").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
    val salted = SkewJoin.saltedJoin(skewed, build, "k", saltFactor = 8)
      .groupBy($"k", $"attr").agg(count(lit(1)).as("n"), sum($"payload").as("s"))

    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt actually spreads the hot key") {
    import spark.implicits._
    val skewed = spark.range(80000).select(lit(7L).as("k"), $"id".as("payload"))
    val perSalt = skewed.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(8)))
      .groupBy($"__salt").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(perSalt.length === 8)
    // uniform-ish: every salt bucket within 3x of the mean
    val mean = perSalt.sum / 8.0
    perSalt.foreach(n => assert(n > mean / 3 && n < mean * 3,
      s"salt imbalance: ${perSalt.toList}"))
  }
}
