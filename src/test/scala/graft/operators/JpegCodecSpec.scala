package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real ImageIO JPEG codec. JPEG is lossy, so the oracle only
  * pins the exact surface (m15); everything lossy is pinned HERE:
  * decode determinism, the decode→encode→decode fixed point, luma
  * plausibility on near-uniform images, and the malformed classes
  * mapped to the sentinel.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 7 + 13) % 256).toByte)

  test("encode→decode: exact dimensions, bands, SOI framing") {
    val jpg = JpegMediaCodec.encodeRgb8(9, 7, gradient(9, 7))
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8,
      "not SOI-framed")
    val m = JpegMediaCodec.meta(1L, jpg)
    assert(m.ok == 1L && m.width == 9L && m.height == 7L &&
      m.n_bands == 3L)
  }

  test("decode is deterministic (same bytes → same features, twice)") {
    val jpg = JpegMediaCodec.encodeRgb8(16, 16, gradient(16, 16))
    val a = JpegMediaCodec.decode(2L, jpg)
    val b = JpegMediaCodec.decode(2L, jpg)
    assert(a === b)
    assert(a.byte_sum >= 0L, "a valid JPEG must decode")
    val ha = JpegMediaCodec.perceptualHash(2L, jpg, 16)
    val hb = JpegMediaCodec.perceptualHash(2L, jpg, 16)
    assert(ha === hb && ha.n_samples == 16L)
  }

  test("decode→encode→decode reaches a fixed point in few steps") {
    // re-encoding an already-decoded image converges: quantization is
    // idempotent once pixel values sit on the quantizer lattice
    var jpg = JpegMediaCodec.encodeRgb8(8, 8, gradient(8, 8))
    var prev = JpegMediaCodec.decode(3L, jpg)
    var converged = false
    for (_ <- 0 until 8 if !converged) {
      jpg = JpegMediaCodec.resize(jpg, 8) // decode + re-encode at 8×8
      val cur = JpegMediaCodec.decode(3L, jpg)
      converged = cur.byte_sum == prev.byte_sum
      prev = cur
    }
    assert(converged, "re-encode loop never stabilized")
  }

  test("near-uniform image decodes to near-uniform luma") {
    // a solid mid-gray block is DC-only: decoded luma must stay close
    val w = 16; val h = 16
    val rgb = Array.fill[Byte](w * h * 3)(128.toByte)
    val f = JpegMediaCodec.decode(4L, JpegMediaCodec.encodeRgb8(w, h, rgb))
    val mean = f.byte_sum.toDouble / (w * h)
    assert(math.abs(mean - 128.0) < 8.0,
      s"solid gray decoded to mean luma $mean")
    // and lands in the h2 bucket (128 >> 6 == 2) for every pixel
    assert(f.h2 == (w * h).toLong, s"histogram spread: $f")
  }

  test("resize emits a real smaller JPEG that decodes") {
    val jpg = JpegMediaCodec.encodeRgb8(32, 32, gradient(32, 32))
    val small = JpegMediaCodec.resize(jpg, 4)
    val m = JpegMediaCodec.meta(5L, small)
    assert(m.ok == 1L && m.width == 4L && m.height == 4L)
  }

  test("malformed classes yield the sentinel, never throw") {
    val good = JpegMediaCodec.encodeRgb8(8, 8, gradient(8, 8))
    val cases = Seq(
      Array.emptyByteArray,
      "not a jpeg at all".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xd8.toByte), // bare SOI
      good.take(good.length / 2), // truncated entropy data
      good.map(b => (b ^ 0x55).toByte)) // scrambled
    for (b <- cases) {
      assert(JpegMediaCodec.decode(9L, b).byte_sum === -1L,
        s"expected sentinel for ${b.length}B")
      assert(JpegMediaCodec.meta(9L, b).ok === 0L)
      assert(JpegMediaCodec.perceptualHash(9L, b, 16).n_samples === 0L)
      assert(JpegMediaCodec.resize(b, 4).isEmpty)
    }
  }
}
