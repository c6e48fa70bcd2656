package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The MP3 frame walk and H.264 NAL walk — real framing over stubbed
  * entropy payloads: length-arithmetic hops, table validation, tag
  * skipping, and the malformed classes mapped to sentinels.
  */
class MediaFramingSpec extends AnyFunSuite {

  test("mp3: VBR frame census and exact duration") {
    val b = Mp3Frames.synthesize(Seq(1, 5, 14), 0, seed = 7L)
    val m = Mp3Frames.meta(3L, b)
    assert(m.n_frames === 3L)
    assert(m.bitrate_kbps_sum === (32 + 64 + 320).toLong)
    assert(m.duration_ms === 3L * 1152 * 1000 / 44100)
  }

  test("mp3: leading ID3v2 tag is skipped by syncsafe length") {
    val frames = Mp3Frames.synthesize(Seq(2, 2), 1, seed = 9L)
    val tagBody = Array.fill[Byte](200)(0x41)
    val id3 = "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0) ++
      Array[Byte](0, 0, (200 >> 7).toByte, (200 & 0x7f).toByte) ++ tagBody
    val m = Mp3Frames.meta(4L, id3 ++ frames)
    assert(m.n_frames === 2L && m.bitrate_kbps_sum === 80L)
  }

  test("mp3: malformed classes yield the sentinel") {
    val good = Mp3Frames.synthesize(Seq(3, 3), 0, seed = 1L)
    val cases = Seq(
      Array.emptyByteArray,
      "not audio".getBytes("US-ASCII"),
      good.dropRight(1), // truncated final frame
      { val b = good.clone(); b(1) = 0xf2.toByte; b }, // MPEG-2
      { val b = good.clone(); b(2) = 0xf0.toByte; b }) // bad bitrate idx
    for (b <- cases)
      assert(Mp3Frames.meta(9L, b).n_frames === -1L,
        s"expected sentinel for ${b.length}B")
  }

  test("h264: NAL census over mixed start-code forms") {
    val plan = Seq((7, 12), (8, 6), (5, 60), (1, 40), (1, 41), (6, 9))
    val b = H264Nals.synthesize(plan, seed = 5L)
    val c = H264Nals.census(2L, b)
    assert(c.n_nals === 6L && c.n_sps === 1L && c.n_pps === 1L &&
      c.n_idr === 1L && c.n_nonidr === 2L)
    assert(c.payload_bytes === (12 + 6 + 60 + 40 + 41 + 9).toLong)
  }

  test("h264: malformed classes yield the sentinel") {
    val good = H264Nals.synthesize(Seq((7, 8), (1, 20)), 3L)
    val forbidden = good.clone()
    forbidden(4) = (forbidden(4) | 0x80).toByte // forbidden_zero_bit
    val cases = Seq(
      Array.emptyByteArray,
      "no start code here".getBytes("US-ASCII"),
      forbidden,
      Array[Byte](0, 0, 1)) // start code, zero-length NAL
    for (b <- cases)
      assert(H264Nals.census(9L, b).n_nals === -1L,
        s"expected sentinel for ${b.length}B")
  }
}
