package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real GIF/LZW codec: encoder→decoder round trips that exercise
  * code-width growth and the table-full clear path, plus the
  * malformed classes mapped to the sentinel. GIF is lossless, so
  * round trips must be pixel-EXACT.
  */
class GifCodecSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, f: Int => Int): Array[Byte] =
    Array.tabulate(w * h)(i => (f(i) & 0xff).toByte)

  test("round trip 8x8: exact pixels, luma features match") {
    val px = gray(8, 8, i => i * 37 + 11)
    val gif = GifMediaCodec.encodeGray8(8, 8, px)
    val d = GifMediaCodec.decodeImage(gif).get
    assert(d.w == 8 && d.h == 8)
    assert(d.pixels.toSeq == px.toSeq, "LZW round trip lost pixels")
    val f = GifMediaCodec.decode(1L, gif)
    assert(f.byte_sum == px.map(p => (p & 0xff).toLong).sum)
  }

  test("round trip 64x64: code width grows 9→10→11 and stays exact") {
    val px = gray(64, 64, i => (i * 131 + (i >> 3) * 17) % 256)
    val gif = GifMediaCodec.encodeGray8(64, 64, px)
    val d = GifMediaCodec.decodeImage(gif).get
    assert(d.pixels.toSeq == px.toSeq)
  }

  test("round trip 128x128: dictionary fills, clear code resets, exact") {
    // high-entropy indices force ~one new dictionary entry per input
    // symbol, so 16k pixels blow through the 4096-entry table and the
    // encoder's mid-stream clear path runs for real
    val px = gray(128, 128, i => (i * 197 + (i * i) % 251) % 256)
    val gif = GifMediaCodec.encodeGray8(128, 128, px)
    val d = GifMediaCodec.decodeImage(gif).get
    assert(d.pixels.toSeq == px.toSeq)
  }

  test("runs compress and survive (KwKwK path)") {
    // long runs of one value generate the KwKwK code sequence
    val px = Array.fill[Byte](256)(42)
    val gif = GifMediaCodec.encodeGray8(16, 16, px)
    assert(gif.length < 16 * 16 + 800 + 64,
      s"runs did not compress: ${gif.length}B")
    assert(GifMediaCodec.decodeImage(gif).get.pixels.toSeq == px.toSeq)
  }

  test("resize + aHash run through the real codec") {
    val px = gray(8, 8, i => if (i < 32) 0 else 200)
    val gif = GifMediaCodec.encodeGray8(8, 8, px)
    val small = GifMediaCodec.resize(gif, 4)
    val d = GifMediaCodec.decodeImage(small).get
    assert(d.w == 4 && d.h == 4)
    val h = GifMediaCodec.perceptualHash(5L, gif, 16)
    assert(h.n_samples == 16L)
  }

  test("malformed classes yield the sentinel, never throw") {
    val good = GifMediaCodec.encodeGray8(8, 8, gray(8, 8, i => i))
    val cases = Seq(
      Array.emptyByteArray,
      "GIF88a______".getBytes("US-ASCII"), // bad version
      good.take(good.length / 2), // truncated code stream
      good.dropRight(2), // missing terminator+trailer
      { val b = good.clone(); b(b.length - 10) = 0xff.toByte; b })
    for (b <- cases) {
      val f = GifMediaCodec.decode(9L, b)
      assert(f.byte_sum === -1L || b.eq(cases.last),
        s"expected sentinel for ${b.length}B")
      // the corrupted-tail case may or may not decode depending on
      // where the flip lands, but it must never throw — reaching this
      // line is the assertion
    }
  }
}
