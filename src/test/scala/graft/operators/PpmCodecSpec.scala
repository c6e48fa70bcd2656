package graft.operators

import graft.operators.BinaryDecode.MediaFeatures
import org.scalatest.funsuite.AnyFunSuite

/** The real PPM/PGM codec against hand-built files: full header
  * grammar (comments, whitespace runs), P5 and P6 luma, every
  * malformed class mapped to the sentinel (total decode), exact
  * resize bytes, and the aHash bit layout.
  */
class PpmCodecSpec extends AnyFunSuite {

  private def img(header: String, pixels: Int*): Array[Byte] =
    header.getBytes("US-ASCII") ++ pixels.map(_.toByte).toArray

  test("P6 decode: luma sum + quartile histogram") {
    // lumas: (10+20+30)/3 = 20, (40+50+60)/3 = 50
    val b = img("P6\n2 1\n255\n", 10, 20, 30, 40, 50, 60)
    assert(PpmMediaCodec.decode(7L, b) ===
      MediaFeatures(7L, b.length.toLong, 70L, 2L, 0L, 0L, 0L))
  }

  test("header grammar: comments and arbitrary whitespace runs parse") {
    val b = img("P6 # a comment\n 2\t1\r\n# another\n255\n",
      10, 20, 30, 40, 50, 60)
    val f = PpmMediaCodec.decode(1L, b)
    assert(f.byte_sum === 70L && f.h0 === 2L)
  }

  test("P5 decode: samples are the luma directly") {
    val b = img("P5\n3 1\n255\n", 0, 100, 200)
    assert(PpmMediaCodec.decode(2L, b) ===
      MediaFeatures(2L, b.length.toLong, 300L, 1L, 1L, 0L, 1L))
  }

  test("malformed payloads yield the sentinel, never throw") {
    val cases = Seq(
      img("P6\n1 1\n65535\n", 1, 2, 3, 4, 5, 6), // 2-byte samples
      img("P6\n2 2\n255\n", 1, 2, 3, 4, 5), // truncated pixels
      img("P7\n2 1\n255\n", 1, 2, 3, 4, 5, 6), // foreign magic
      img("P6\n2 x\n255\n", 1, 2, 3), // non-numeric dimension
      "not an image at all".getBytes("US-ASCII"),
      Array.emptyByteArray)
    for (b <- cases) {
      val f = PpmMediaCodec.decode(9L, b)
      assert(f.byte_sum === -1L && f.n_bytes === b.length.toLong)
      assert(PpmMediaCodec.resize(b, 2).isEmpty)
      assert(PpmMediaCodec.perceptualHash(9L, b, 8).n_samples === 0L)
    }
  }

  test("resize: nearest-neighbor, re-emitted as a valid file") {
    val b = img("P6\n2 2\n255\n", 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val r = PpmMediaCodec.resize(b, 1)
    assert(r === img("P6\n1 1\n255\n", 1, 2, 3))
    // and the output itself decodes
    assert(PpmMediaCodec.decode(0L, r).byte_sum === 2L) // (1+2+3)/3
  }

  test("aHash: bit i set iff sample luma beats the mean (P5)") {
    val b = img("P5\n4 1\n255\n", 0, 0, 255, 255)
    val h = PpmMediaCodec.perceptualHash(3L, b, 4)
    assert(h.n_samples === 4L)
    assert(h.ahash === 12L) // bits 2 and 3
  }

  test("aHash grid larger than the image clamps to pixel count") {
    val b = img("P5\n2 1\n255\n", 10, 200)
    val h = PpmMediaCodec.perceptualHash(4L, b, 16)
    assert(h.n_samples === 2L && h.ahash === 2L)
  }
}
