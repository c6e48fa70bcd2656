package graft.operators

import scala.util.Random

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Property test: [[AsofJoin.asofBackward]] agrees with the obvious
  * per-row reference model (for each left row: the right row with the
  * greatest ts ≤ left.ts in the same key group) on randomized inputs —
  * the recompute-from-first-principles oracle style the reference's
  * own tests use (/root/reference/tests/fizz_buzz.rs:44-61).
  * Deterministic seed; 12 random topologies incl. empty sides.
  */
class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("asofBackward matches the per-row reference model") {
    import spark.implicits._
    val rnd = new Random(42)
    for (round <- 0 until 12) {
      val nLeft = if (round == 0) 0 else rnd.nextInt(40)
      val nRight = if (round == 1) 0 else rnd.nextInt(40)
      val left = (0 until nLeft)
        .map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong))
      val right = (0 until nRight)
        .map(_ => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong,
          rnd.nextInt(1000).toLong))

      val l = left.toDF("k", "ts", "lid")
      val r = right.toDF("k", "rts", "v")
      val got = AsofJoin.asofBackward(l, r, Seq("k"), "ts", "rts",
          Seq("rts" -> "matched_ts"))
        .select("lid", "matched_ts").collect()
        .map(row => (row.getLong(0),
          if (row.isNullAt(1)) None else Some(row.getLong(1))))
        .sortBy(_._1).toList

      val expected = left.map { case (k, ts, lid) =>
        val cands = right.filter(rr => rr._1 == k && rr._2 <= ts)
        (lid, if (cands.isEmpty) None else Some(cands.map(_._2).max))
      }.sortBy(_._1).toList

      assert(got === expected, s"round $round: left=$left right=$right")
    }
  }
}
