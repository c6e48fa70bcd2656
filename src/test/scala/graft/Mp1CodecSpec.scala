package graft

import graft.operators.Mp1Codec
import graft.operators.Mp1Codec.Mp1Frame
import org.scalatest.funsuite.AnyFunSuite

/** The payload contract: every integer the bitstream carries —
  * allocations, scalefactors, quantized codes in the 12-slot
  * interleave — must round-trip exactly, the CRC must actually
  * protect its span, and malformed streams land on the sentinel.
  */
class Mp1CodecSpec extends AnyFunSuite {

  private def demoFrame(seed: Int): Mp1Frame = {
    val alloc = Array.tabulate(32)(sb =>
      if ((seed + sb) % 4 == 0) 2 + (seed + sb) % 8 else 0)
    val scf = Array.tabulate(32)(sb => (seed * 3 + sb * 7) % 63)
    val codes = Array.tabulate(32, 12) { (sb, q) =>
      if (alloc(sb) == 0) 0
      else (seed + sb * 29 + q * 3) % (1 << alloc(sb))
    }
    Mp1Frame(alloc, scf, codes)
  }

  private def census(frames: Seq[Mp1Frame]): (Long, Long, Long, Long) = {
    var nAlloc = 0L; var scfSum = 0L; var codeSum = 0L; var wSum = 0L
    frames.zipWithIndex.foreach { case (fr, f) =>
      for (sb <- 0 until 32; if fr.alloc(sb) > 0) {
        nAlloc += 1
        scfSum += fr.scf(sb)
        for (q <- 0 until 12) {
          codeSum += fr.codes(sb)(q)
          wSum += fr.codes(sb)(q).toLong * (f * 384L + q * 32L + sb + 1L)
        }
      }
    }
    (nAlloc, scfSum, codeSum, wSum)
  }

  test("multi-frame round trip: every allocation, scalefactor and " +
      "sample code is recovered exactly") {
    val frames = (0 until 4).map(demoFrame)
    val f = Mp1Codec.decode(1L, Mp1Codec.encodeMono(frames))
    val (na, ss, cs, ws) = census(frames)
    assert(f.n_frames == 4 && f.kbps_sum == 4 * 224)
    assert((f.n_alloc, f.scf_sum, f.code_sum, f.weighted_sum) ==
      (na, ss, cs, ws))
  }

  test("all-silent frame (no allocations) still walks") {
    val silent = Mp1Frame(new Array[Int](32), new Array[Int](32),
      Array.ofDim[Int](32, 12))
    val f = Mp1Codec.decode(2L,
      Mp1Codec.encodeMono(Seq(silent, demoFrame(5))))
    assert(f.n_frames == 2 && f.n_alloc == census(Seq(demoFrame(5)))._1)
  }

  test("full-width codes at nb = 15 round trip (saturated quantizer)") {
    val alloc = new Array[Int](32); alloc(0) = 15; alloc(31) = 15
    val scf = new Array[Int](32); scf(0) = 62
    val codes = Array.ofDim[Int](32, 12)
    for (q <- 0 until 12) {
      codes(0)(q) = (1 << 15) - 1
      codes(31)(q) = q
    }
    val fr = Mp1Frame(alloc, scf, codes)
    val f = Mp1Codec.decode(3L, Mp1Codec.encodeMono(Seq(fr)))
    val (na, ss, cs, ws) = census(Seq(fr))
    assert((f.n_alloc, f.scf_sum, f.code_sum, f.weighted_sum) ==
      (na, ss, cs, ws))
  }

  test("a flipped allocation bit fails the CRC, not the parse") {
    val good = Mp1Codec.encodeMono(Seq(demoFrame(7)))
    val b = good.clone()
    b(6) = (b(6) ^ 0x10).toByte // inside the 128 allocation bits
    assert(Mp1Codec.decode(4L, b).n_frames == -1L)
  }

  test("malformed classes yield the sentinel, never an exception") {
    val good = Mp1Codec.encodeMono(Seq(demoFrame(3), demoFrame(9)))
    def bad(mutate: Array[Byte] => Array[Byte]): Unit =
      assert(Mp1Codec.decode(9L, mutate(good.clone())).n_frames == -1L)
    bad { b => b(0) = 0x7f; b } // broken sync
    bad { b => b(1) = (b(1) & 0xf7).toByte; b } // ID=0 (MPEG-2)
    bad { b => b(1) = (b(1) & 0xf9 | 0x02).toByte; b } // Layer III
    bad { b => b(2) = (b(2) | 0xf0).toByte; b } // bitrate index 15
    bad { b => b(2) = (b(2) & 0x0f).toByte; b } // free-format bitrate 0
    bad { b => b(3) = (b(3) & 0x3f).toByte; b } // stereo mode
    bad(b => java.util.Arrays.copyOf(b, b.length - 7)) // truncated frame
    bad(b => java.util.Arrays.copyOf(b, 3)) // shorter than a header
    assert(Mp1Codec.decode(9L, Array.emptyByteArray).n_frames == -1L)
    // trailing garbage after the last frame: the walk must refuse it
    bad { b =>
      val out = java.util.Arrays.copyOf(b, b.length + 5)
      out(b.length) = 0x12; out
    }
  }

  test("second frame's payload is independent: codes land in the " +
      "right frame's weights") {
    val a = demoFrame(3); val bfr = demoFrame(11)
    val both = Mp1Codec.decode(5L, Mp1Codec.encodeMono(Seq(a, bfr)))
    val onlyA = Mp1Codec.decode(5L, Mp1Codec.encodeMono(Seq(a)))
    val onlyB = Mp1Codec.decode(5L, Mp1Codec.encodeMono(Seq(bfr)))
    assert(both.code_sum == onlyA.code_sum + onlyB.code_sum)
    // weighted sums shift by 384 per frame index: b's contribution at
    // frame 1 differs from its frame-0 weighting by exactly 384·codes
    val shiftedB = census(Seq(a, bfr))._4 - census(Seq(a))._4
    assert(both.weighted_sum == onlyA.weighted_sum + shiftedB)
    assert(shiftedB == onlyB.weighted_sum + 384L * onlyB.code_sum)
  }
}
