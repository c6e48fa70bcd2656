package graft

import graft.operators.FlvScreenVideo
import graft.operators.FlvScreenVideo.SvFrame
import org.scalatest.funsuite.AnyFunSuite

/** The inter-frame contract is the whole point: the decoded video is
  * the last-writer-wins overlay of the tag sequence, bit-exact; and
  * any stream the grammar does not cover must land on the sentinel,
  * never an exception.
  */
class FlvCodecSpec extends AnyFunSuite {

  private val W = 40; private val H = 24; private val BS = 16
  private val nbx = 3

  private def blockDims(k: Int): (Int, Int, Int, Int) = {
    val bx = k % nbx; val by = k / nbx
    (bx * BS, by * BS, math.min(BS, W - bx * BS), math.min(BS, H - by * BS))
  }

  private def keyframe(f: Int => Int): SvFrame =
    SvFrame(key = true, (0 until 6).map { k =>
      val (x0, y0, bw, bh) = blockDims(k)
      k -> Array.tabulate(bw * bh) { q =>
        f((y0 + q / bw) * W + x0 + q % bw).toByte
      }
    }.toMap)

  private def canvasOf(f: Int => Int): Array[Int] =
    Array.tabulate(W * H)(p => f(p) & 0xff)

  private def sums(c: Array[Int]): (Long, Long) = {
    var s = 0L; var ws = 0L
    var p = 0
    while (p < c.length) { s += c(p); ws += c(p).toLong * (p + 1); p += 1 }
    (s, ws)
  }

  test("keyframe-only stream reproduces the canvas exactly " +
      "(edge blocks clipped, gradient data)") {
    val flv = FlvScreenVideo.encode(W, H, BS, BS,
      Seq(keyframe(p => (p * 7 + 3) % 256)))
    val f = FlvScreenVideo.decode(1L, flv)
    val (s, ws) = sums(canvasOf(p => (p * 7 + 3) % 256))
    assert(f.n_frames == 1 && f.n_keyframes == 1 && f.blocks_updated == 0)
    assert((f.byte_sum, f.weighted_sum) == (s, ws))
  }

  test("inter frames compose last-writer-wins: two writes to the " +
      "same block, the later one is the decoded state") {
    val k = 4 // an edge block (8 tall)
    val (_, _, bw, bh) = blockDims(k)
    val flv = FlvScreenVideo.encode(W, H, BS, BS, Seq(
      keyframe(p => p % 256),
      SvFrame(key = false, Map(k -> Array.fill(bw * bh)(50.toByte))),
      SvFrame(key = false, Map(k -> Array.fill(bw * bh)(200.toByte)))))
    val f = FlvScreenVideo.decode(2L, flv)
    val (x0, y0, _, _) = blockDims(k)
    val expect = canvasOf(p => p % 256)
    for (y <- y0 until y0 + bh; x <- x0 until x0 + bw)
      expect(y * W + x) = 200
    val (s, ws) = sums(expect)
    assert(f.n_frames == 3 && f.n_keyframes == 1 && f.blocks_updated == 2)
    assert((f.byte_sum, f.weighted_sum) == (s, ws))
  }

  test("a mid-stream keyframe resets every block") {
    val flv = FlvScreenVideo.encode(W, H, BS, BS, Seq(
      keyframe(p => p % 256),
      SvFrame(key = false, Map(0 ->
        Array.fill(BS * BS)(9.toByte))),
      keyframe(_ => 77)))
    val f = FlvScreenVideo.decode(3L, flv)
    val (s, ws) = sums(canvasOf(_ => 77))
    assert(f.n_frames == 3 && f.n_keyframes == 2 && f.blocks_updated == 1)
    assert((f.byte_sum, f.weighted_sum) == (s, ws))
  }

  test("audio and script tags are skipped by size, video still decodes") {
    val base = FlvScreenVideo.encode(W, H, BS, BS,
      Seq(keyframe(p => (p * 3) % 256)))
    // splice a script tag (type 18) between header and the video tag
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 13)
    val script = Array[Byte](1, 2, 3, 4, 5)
    out.write(18)
    out.write(0); out.write(0); out.write(script.length)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(0)
    out.write(script, 0, script.length)
    val pts = 11 + script.length
    out.write(0); out.write(0); out.write(pts >> 8); out.write(pts & 0xff)
    out.write(base, 13, base.length - 13)
    val f = FlvScreenVideo.decode(4L, out.toByteArray)
    val (s, ws) = sums(canvasOf(p => (p * 3) % 256))
    assert(f.n_frames == 1 && (f.byte_sum, f.weighted_sum) == (s, ws))
  }

  test("malformed classes yield the sentinel, never an exception") {
    val good = FlvScreenVideo.encode(W, H, BS, BS,
      Seq(keyframe(p => p % 256)))
    def bad(mutate: Array[Byte] => Array[Byte]): Unit = {
      val b = mutate(good.clone())
      assert(FlvScreenVideo.decode(9L, b).n_frames == -1L)
    }
    bad { b => b(0) = 'X'; b } // signature
    bad { b => b(3) = 2; b } // version
    bad { b => b(4) = 0x04; b } // audio-only flags
    bad { b => b(13 + 11) = ((1 << 4) | 2).toByte; b } // codec id 2
    bad { b => b(13 + 11) = ((2 << 4) | 3).toByte; b } // inter frame first
    bad(b => java.util.Arrays.copyOf(b, b.length - 3)) // truncated prevTagSize
    bad { b => b(b.length - 1) = (b(b.length - 1) + 1).toByte; b } // prevTagSize off
    bad { b => b(13 + 18) = (b(13 + 18) ^ 0x55).toByte; b } // corrupt zlib
    bad(b => java.util.Arrays.copyOf(b, 20)) // mid-tag truncation
    assert(FlvScreenVideo.decode(9L, Array.emptyByteArray).n_frames == -1L)
  }

  test("a keyframe with an unchanged (dataSize 0) block is malformed") {
    val full = keyframe(p => p % 256)
    intercept[IllegalArgumentException] {
      FlvScreenVideo.encode(W, H, BS, BS,
        Seq(SvFrame(key = true, full.blocks - 2)))
    }
    // hand-build the illegal stream: take a valid one-keyframe file and
    // zero out block 2's dataSize by re-encoding it as an inter frame
    // pattern spliced under a keyframe type bit
    val inter = FlvScreenVideo.encode(W, H, BS, BS, Seq(
      full, SvFrame(key = false, Map())))
    // second tag is an inter frame with ALL dataSize 0; flip its frame
    // type to "key" — now a keyframe with unchanged blocks
    val tag2 = 13 + (11 + tagSize(inter, 13) + 4)
    inter(tag2 + 11) = ((1 << 4) | 3).toByte
    assert(FlvScreenVideo.decode(7L, inter).n_frames == -1L)
  }

  private def tagSize(b: Array[Byte], at: Int): Int =
    ((b(at + 1) & 0xff) << 16) | ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)

  test("dimension drift across frames is malformed") {
    val a = FlvScreenVideo.encode(W, H, BS, BS, Seq(keyframe(p => p % 256)))
    val smallKey = SvFrame(key = true, Map(0 ->
      Array.tabulate(16 * 16)(q => (q % 256).toByte)))
    val b = FlvScreenVideo.encode(16, 16, BS, BS, Seq(smallKey))
    // concatenate a's tags then b's tags under one header
    val out = new java.io.ByteArrayOutputStream()
    out.write(a, 0, a.length)
    out.write(b, 13, b.length - 13)
    assert(FlvScreenVideo.decode(8L, out.toByteArray).n_frames == -1L)
  }
}
