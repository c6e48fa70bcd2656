package graft

import graft.operators.FlacCodec
import org.scalatest.funsuite.AnyFunSuite

/** The lossless contract is the whole point: encode→decode must be
  * BIT-EXACT for every supported shape, and any stream the grammar
  * does not cover (or that fails its CRCs) must land on the sentinel,
  * never an exception.
  */
class FlacCodecSpec extends AnyFunSuite {

  private def signal(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(i => (((seed * 31 + i.toLong * 17) % 4001) - 2000).toInt)

  private def features(s: Array[Int]): (Long, Long, Long) = {
    var abs = 0L; var zc = 0L; var ws = 0L
    var i = 0
    while (i < s.length) {
      abs += math.abs(s(i).toLong)
      ws += s(i).toLong * (i + 1)
      if (i > 0 && ((s(i) < 0) != (s(i - 1) < 0))) zc += 1
      i += 1
    }
    (abs, zc, ws)
  }

  test("round trip is bit-exact for every fixed order, multi-frame, " +
      "partial last block") {
    for (order <- 0 to 4) {
      val s = signal(600, seed = 7 + order)
      val flac = FlacCodec.encodeMono(s, 8000, blockSize = 256,
        order = order)
      val f = FlacCodec.decode(42L, flac)
      val (abs, zc, ws) = features(s)
      assert(f.n_samples == 600, s"order $order")
      assert(f.sample_rate == 8000)
      assert((f.abs_sum, f.zero_crossings, f.weighted_sum) ==
        (abs, zc, ws), s"order $order features drifted")
    }
  }

  test("multi-byte UTF-8 frame numbers (>127 frames) round trip") {
    val s = signal(1040, seed = 21)
    val f = FlacCodec.decode(9L, FlacCodec.encodeMono(s, 8000,
      blockSize = 8, order = 1)) // 130 frames: 2-byte frame numbers
    val (abs, zc, ws) = features(s)
    assert((f.n_samples, f.abs_sum, f.zero_crossings, f.weighted_sum) ==
      (1040L, abs, zc, ws))
  }

  test("full-range 16-bit extremes round trip (saturated residuals)") {
    val s = Array(32767, -32768, 32767, -32768, 0, 1, -1, 32767,
      -32768, 12345, -12345, 0)
    val f = FlacCodec.decode(1L,
      FlacCodec.encodeMono(s, 44100, blockSize = 8, order = 2))
    val (abs, zc, ws) = features(s)
    assert(f.n_samples == s.length &&
      (f.abs_sum, f.zero_crossings, f.weighted_sum) == (abs, zc, ws))
  }

  test("constant blocks take the CONSTANT subframe and round trip") {
    val s = Array.fill(300)(-1234)
    val flac = FlacCodec.encodeMono(s, 16000, blockSize = 100, order = 2)
    val f = FlacCodec.decode(2L, flac)
    assert(f.n_samples == 300 && f.abs_sum == 1234L * 300)
    // constant coding is ~an order of magnitude smaller than verbatim
    val verb = FlacCodec.encodeMono(s, 16000, blockSize = 100,
      order = 2, forceVerbatim = true)
    assert(flac.length * 4 < verb.length)
  }

  test("VERBATIM subframes decode (any-encoder tolerance)") {
    val s = signal(200, seed = 99)
    val f = FlacCodec.decode(3L, FlacCodec.encodeMono(s, 8000,
      blockSize = 64, order = 0, forceVerbatim = true))
    val (abs, zc, ws) = features(s)
    assert((f.n_samples, f.abs_sum, f.zero_crossings, f.weighted_sum) ==
      (200L, abs, zc, ws))
  }

  test("the Rice escape code (raw residuals) decodes") {
    val s = signal(150, seed = 5)
    val f = FlacCodec.decode(4L, FlacCodec.encodeMono(s, 8000,
      blockSize = 75, order = 1, forceEscape = true))
    val (abs, zc, ws) = features(s)
    assert((f.n_samples, f.abs_sum, f.zero_crossings, f.weighted_sum) ==
      (150L, abs, zc, ws))
  }

  test("wasted-bits-per-sample: shifted signal carries the unary " +
      "prefix and reconstructs the shift") {
    val base = signal(120, seed = 3)
    val s = base.map(v => (v >> 2) << 3) // multiples of 8: 3 wasted bits
    val f = FlacCodec.decode(5L, FlacCodec.encodeMono(s, 8000,
      blockSize = 60, order = 2, wastedBits = 3))
    val (abs, zc, ws) = features(s)
    assert((f.n_samples, f.abs_sum, f.zero_crossings, f.weighted_sum) ==
      (120L, abs, zc, ws))
  }

  test("corruption lands on the sentinel, never an exception") {
    val s = signal(400, seed = 11)
    val good = FlacCodec.encodeMono(s, 8000, blockSize = 128, order = 2)
    assert(FlacCodec.decode(6L, good).n_samples == 400)
    // flip one byte in the middle of a frame body: CRC-16 catches it
    val mid = good.clone()
    mid(good.length / 2) = (mid(good.length / 2) ^ 0x40).toByte
    assert(FlacCodec.decode(6L, mid).n_samples == -1)
    // flip a frame-header byte: CRC-8 catches it (46 = past fLaC +
    // STREAMINFO block = first frame's header region)
    val hdr = good.clone()
    hdr(46) = (hdr(46) ^ 0x01).toByte
    assert(FlacCodec.decode(6L, hdr).n_samples == -1)
    // truncation at every eighth byte: sentinel, no throw
    (1 until good.length by 8).foreach { cut =>
      assert(FlacCodec.decode(6L,
        java.util.Arrays.copyOf(good, cut)).n_samples == -1)
    }
    // not FLAC at all
    assert(FlacCodec.decode(6L, Array[Byte](1, 2, 3)).n_samples == -1)
    assert(FlacCodec.decode(6L,
      "fLaCbut-not-really-a-stream-at-all-padding".getBytes).n_samples == -1)
  }

  test("single-sample and empty streams") {
    val one = FlacCodec.decode(7L,
      FlacCodec.encodeMono(Array(-7), 8000, blockSize = 16, order = 2))
    assert(one.n_samples == 1 && one.abs_sum == 7 && one.weighted_sum == -7)
    val empty = FlacCodec.decode(8L,
      FlacCodec.encodeMono(Array.empty[Int], 8000))
    assert(empty.n_samples == 0 && empty.abs_sum == 0)
  }
}
