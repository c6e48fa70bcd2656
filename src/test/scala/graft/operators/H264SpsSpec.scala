package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** H.264 SPS round trips: encode-then-parse over a dimension sweep
  * (crop and no-crop, both levels), plus the totality sentinels the
  * never-throw contract requires.
  */
class H264SpsSpec extends AnyFunSuite {

  test("round trip over a dimension sweep, crop arithmetic exact") {
    for {
      w <- Seq(2, 16, 30, 100, 112, 640, 1918, 1920, 4096, 7680)
      h <- Seq(2, 16, 64, 70, 480, 1080, 2160)
      profile <- Seq(66, 77, 100, 244)
      level <- Seq(30, 51)
    } {
      val bytes = H264Sps.encode(w, h, profile, level)
      val got = H264Sps.parse(42L, bytes)
      assert(got.ok === 1L, s"${w}x$h failed to parse")
      assert((got.width, got.height) === (w.toLong, h.toLong),
        s"dims ${w}x$h round-tripped as ${got.width}x${got.height}")
      assert(got.profile_idc === profile.toLong)
      assert(got.level_idc === level.toLong)
      assert(got.n_mbs === ((w + 15) / 16).toLong * ((h + 15) / 16))
    }
  }

  test("High-profile SPS with scaling lists present yields the sentinel, " +
      "never garbage dimensions with ok=1") {
    // hand-build a profile-100 SPS whose seq_scaling_matrix_present
    // flag is SET: the parser does not decode scaling lists, so it
    // must bail honestly rather than misread the following fields
    val clean = H264Sps.encode(640, 480, 100, 40)
    val got = H264Sps.parse(9L, clean)
    assert(got.ok === 1L && got.width === 640L && got.height === 480L)
    // flip seq_scaling_matrix_present_flag: profile(8)+constraints(8)
    // +level(8) = 24 bits, then ue(0)=1 bit sps_id, ue(1)="010" 3-bit
    // chroma, ue(0)+ue(0) bit depths, u(1) qpprime → the flag is bit
    // 31 (0-indexed) of the RBSP; SPS payload starts at byte 5 of the
    // annex-B stream (4-byte start code + NAL header)
    val bitIx = 8 + 8 + 8 + 1 + 3 + 1 + 1 + 1
    val byteIx = 5 + bitIx / 8
    val mask = (0x80 >> (bitIx % 8)).toByte
    val dirty = clean.clone()
    dirty(byteIx) = (dirty(byteIx) ^ mask).toByte
    assert(H264Sps.parse(10L, dirty).ok === 0L)
  }

  test("multiple-of-16 dims emit no crop and still round trip") {
    val got = H264Sps.parse(1L, H264Sps.encode(1920, 1088, 66, 40))
    assert(got.ok === 1L && got.width === 1920L && got.height === 1088L)
  }

  test("huge mb counts exercise long Exp-Golomb codes (and likely " +
      "emulation-prevention sequences)") {
    for (w <- Seq(16 * 3000, 16 * 4096); h <- Seq(16 * 1024)) {
      val got = H264Sps.parse(7L, H264Sps.encode(w, h, 66, 51))
      assert(got.ok === 1L && got.width === w.toLong &&
        got.height === h.toLong)
    }
  }

  test("totality: garbage, truncation, and SPS-free streams yield the " +
      "sentinel, never a throw") {
    assert(H264Sps.parse(1L, Array.emptyByteArray).ok === 0L)
    assert(H264Sps.parse(2L, Array.fill(64)(0x55.toByte)).ok === 0L)
    // valid NAL stream but no SPS in it
    val noSps = H264Nals.synthesize(Seq((1, 20), (8, 6)), seed = 3L)
    assert(H264Sps.parse(3L, noSps).ok === 0L)
    // truncate a real SPS mid-bits: every prefix must stay total
    val full = H264Sps.encode(100, 66, 66, 30)
    for (cut <- 0 until full.length) {
      val r = H264Sps.parse(4L, full.take(cut))
      assert(r.ok === 0L || cut >= full.length - 1,
        s"truncated-at-$cut parse claimed ok")
    }
  }

  test("corrupting any single byte never throws") {
    val full = H264Sps.encode(112, 72, 66, 40)
    for (i <- full.indices) {
      val mut = full.clone()
      mut(i) = (mut(i) ^ 0x5a).toByte
      H264Sps.parse(9L, mut) // must not throw; ok value unconstrained
    }
  }
}
