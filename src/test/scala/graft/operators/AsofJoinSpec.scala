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
          Seq("rts" -> "matched_ts", "v" -> "matched_v"),
          tieBreak = Some("v"))
        .select("lid", "matched_ts", "matched_v").collect()
        .map(row => (row.getLong(0),
          if (row.isNullAt(1)) None else Some(row.getLong(1)),
          if (row.isNullAt(2)) None else Some(row.getLong(2))))
        .sortBy(_._1).toList

      val expected = left.map { case (k, ts, lid) =>
        val cands = right.filter(rr => rr._1 == k && rr._2 <= ts)
        if (cands.isEmpty) (lid, None: Option[Long], None: Option[Long])
        else {
          val bestTs = cands.map(_._2).max
          // deterministic tie rule: highest tieBreak value wins
          val bestV = cands.filter(_._2 == bestTs).map(_._3).max
          (lid, Some(bestTs), Some(bestV))
        }
      }.sortBy(_._1).toList

      assert(got === expected, s"round $round: left=$left right=$right")
    }
  }

  test("asofForward matches the per-row reference model") {
    import spark.implicits._
    val rnd = new Random(7)
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
      val got = AsofJoin.asofForward(l, r, Seq("k"), "ts", "rts",
          Seq("rts" -> "matched_ts", "v" -> "matched_v"),
          tieBreak = Some("v"))
        .select("lid", "matched_ts", "matched_v").collect()
        .map(row => (row.getLong(0),
          if (row.isNullAt(1)) None else Some(row.getLong(1)),
          if (row.isNullAt(2)) None else Some(row.getLong(2))))
        .sortBy(_._1).toList

      val expected = left.map { case (k, ts, lid) =>
        val cands = right.filter(rr => rr._1 == k && rr._2 >= ts)
        if (cands.isEmpty) (lid, None: Option[Long], None: Option[Long])
        else {
          val bestTs = cands.map(_._2).min
          // deterministic tie rule (mirror of backward): lowest wins
          val bestV = cands.filter(_._2 == bestTs).map(_._3).min
          (lid, Some(bestTs), Some(bestV))
        }
      }.sortBy(_._1).toList

      assert(got === expected, s"round $round: left=$left right=$right")
    }
  }

  test("matched row is atomic: NULL fields stay NULL, columns never blend") {
    import spark.implicits._
    // ts=2 row is the correct match; its v is genuinely NULL and its w
    // differs from the older row — per-column ignore-nulls fill would
    // backfill v=5 from ts=1 and return a row that never existed
    val right = Seq(
      (1L, 1L, Some(5L), Some(100L)),
      (1L, 2L, None: Option[Long], Some(200L))).toDF("k", "rts", "v", "w")
    val left = Seq((1L, 3L, 0L)).toDF("k", "ts", "lid")
    val row = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "rts",
        Seq("v" -> "mv", "w" -> "mw", "rts" -> "mts"))
      .select("mv", "mw", "mts").head()
    assert(row.isNullAt(0), "NULL field of the matched row must stay NULL")
    assert(row.getLong(1) === 200L && row.getLong(2) === 2L)
  }
}
