package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real AVI/MJPEG codec: container walk + per-frame ImageIO JPEG
  * decode. The lossy half of m18's oracle split lives here:
  * determinism, luma plausibility, stride accounting, malformed
  * classes to the sentinel.
  */
class AviCodecSpec extends AnyFunSuite {

  private def frame(seed: Int): Array[Byte] = {
    val rgb = Array.tabulate(8 * 8 * 3)(i => ((seed * 41 + i * 3) % 256).toByte)
    JpegMediaCodec.encodeRgb8(8, 8, rgb)
  }

  test("round trip: frame count, dimensions, stride sampling") {
    val avi = AviCodec.aviMjpeg(8, 8, (0 until 6).map(frame))
    val got = AviCodec.frameSample(1L, avi, stride = 2)
    assert(got.map(_.frame_idx) === Seq(0L, 2L, 4L))
    assert(got.forall(f => f.n_frames == 6L && f.width == 8L &&
      f.height == 8L))
  }

  test("decode is deterministic and luma is plausible") {
    // near-uniform mid-gray frames: decoded mean luma must stay close
    val gray = JpegMediaCodec.encodeRgb8(8, 8,
      Array.fill[Byte](8 * 8 * 3)(128.toByte))
    val avi = AviCodec.aviMjpeg(8, 8, Seq(gray, gray))
    val a = AviCodec.frameSample(2L, avi, 1)
    assert(a === AviCodec.frameSample(2L, avi, 1))
    val mean = a.head.y_sum.toDouble / 64
    assert(math.abs(mean - 128.0) < 8.0, s"gray mean drifted: $mean")
  }

  test("malformed containers yield the sentinel, never throw") {
    val good = AviCodec.aviMjpeg(8, 8, Seq(frame(0)))
    val corrupt = good.clone()
    // scramble the JPEG payload inside movi (SOI marker broken)
    val moviAt = {
      var k = 0
      while (!(corrupt(k) == 'm' && corrupt(k + 1) == 'o' &&
        corrupt(k + 2) == 'v' && corrupt(k + 3) == 'i')) k += 1
      k
    }
    corrupt(moviAt + 12) = 0x00 // first frame's SOI 0xFF -> 0x00
    val cases = Seq(
      Array.emptyByteArray,
      "RIFFxxxxWAVE".getBytes("US-ASCII"), // not an AVI
      good.take(good.length / 2), // truncated
      corrupt)
    for (b <- cases) {
      val got = AviCodec.frameSample(9L, b, 1)
      assert(got.map(_.n_frames) === Seq(-1L),
        s"expected sentinel for ${b.length}B")
    }
  }
}
