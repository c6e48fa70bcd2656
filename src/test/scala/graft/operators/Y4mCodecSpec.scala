package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real y4m parser against hand-built streams: header tag
  * grammar, colorspace plane sizing, frame iteration with stride
  * sampling, and every malformed class mapped to the sentinel.
  */
class Y4mCodecSpec extends AnyFunSuite {

  private def y4m(header: String, frames: Seq[Array[Byte]]): Array[Byte] =
    header.getBytes("US-ASCII") ++
      frames.flatMap(f => "FRAME\n".getBytes("US-ASCII") ++ f).toArray

  test("C420 2x2: Y plane stats per frame, U/V skipped by size") {
    // frame = 4 Y bytes + 1 U + 1 V
    val f0 = Array[Byte](10, 20, 30, 40, 99, 99)
    val f1 = Array[Byte](5, 5, 5, 5, 99, 99)
    val got = Y4mCodec.frameSample(1L,
      y4m("YUV4MPEG2 W2 H2 F25:1\n", Seq(f0, f1)), stride = 1)
    assert(got.map(g => (g.frame_idx, g.y_sum, g.y_min, g.y_max)) ===
      Seq((0L, 100L, 10L, 40L), (1L, 20L, 5L, 5L)))
    assert(got.forall(g => g.n_frames == 2L && g.width == 2L))
  }

  test("stride sampling picks every k-th frame but counts all") {
    val fs = (0 until 5).map(i =>
      Array.fill[Byte](6)((i * 10).toByte))
    val got = Y4mCodec.frameSample(2L,
      y4m("YUV4MPEG2 W2 H2 F30:1 Ip A1:1\n", fs), stride = 2)
    assert(got.map(_.frame_idx) === Seq(0L, 2L, 4L))
    assert(got.forall(_.n_frames == 5L))
  }

  test("colorspace tags size the chroma planes (C444, Cmono)") {
    // C444 2x2: 4 Y + 4 U + 4 V
    val full = Array[Byte](1, 2, 3, 4, 9, 9, 9, 9, 9, 9, 9, 9)
    val g444 = Y4mCodec.frameSample(3L,
      y4m("YUV4MPEG2 W2 H2 F25:1 C444\n", Seq(full)), 1)
    assert(g444.head.y_sum === 10L && g444.head.n_frames === 1L)
    // mono 2x2: 4 Y only
    val gm = Y4mCodec.frameSample(3L,
      y4m("YUV4MPEG2 W2 H2 F25:1 Cmono\n",
        Seq(Array[Byte](1, 2, 3, 4))), 1)
    assert(gm.head.y_sum === 10L)
  }

  test("malformed streams yield the sentinel, never throw") {
    val good = y4m("YUV4MPEG2 W2 H2 F25:1\n",
      Seq(Array[Byte](1, 2, 3, 4, 9, 9)))
    val cases = Seq(
      "MPEG4 something else\n".getBytes("US-ASCII"),
      "YUV4MPEG2 W2 H2 F25:1".getBytes("US-ASCII"), // no newline
      "YUV4MPEG2 H2 F25:1\n".getBytes("US-ASCII"), // missing W
      y4m("YUV4MPEG2 W2 H2 C999\n", Seq(Array[Byte](1, 2, 3, 4))),
      good.dropRight(1), // truncated plane
      good ++ "FRAM".getBytes("US-ASCII"), // broken second marker
      Array.emptyByteArray)
    for (b <- cases) {
      val got = Y4mCodec.frameSample(9L, b, 1)
      assert(got.map(_.n_frames) === Seq(-1L),
        s"expected sentinel for ${b.length}B")
    }
  }

  test("Int-overflow dimensions (W46341 H46341) yield the sentinel") {
    // 46341^2 > Int.MaxValue: a naive Int w*h goes negative, walking
    // the frame cursor backwards into an ArrayIndexOutOfBounds — the
    // plane sizes must be validated in Long against the payload
    for (hdr <- Seq(
        "YUV4MPEG2 W46341 H46341 Cmono\n",
        "YUV4MPEG2 W46341 H46341\n", // C420 default: uv also overflows
        "YUV4MPEG2 W2147483647 H2 C444\n")) {
      val b = y4m(hdr, Seq(Array.fill[Byte](64)(7)))
      val got = Y4mCodec.frameSample(11L, b, 1)
      assert(got.map(_.n_frames) === Seq(-1L),
        s"expected sentinel for header ${hdr.trim}")
    }
  }
}
