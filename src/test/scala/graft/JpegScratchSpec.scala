package graft

import graft.operators.JpegScratch
import org.scalatest.funsuite.AnyFunSuite

/** Realness is the contract, proven in BOTH directions against the
  * JDK's own codec: ImageIO must decode the from-scratch bitstream
  * (pixel-exact where the IDCT is exact), and the from-scratch
  * decoder must parse ImageIO's own grayscale encoder output —
  * foreign tables, foreign bitstream. Plus the usual: exact
  * coefficient round trips, restart-marker prediction resets,
  * malformed → sentinel.
  */
class JpegScratchSpec extends AnyFunSuite {

  private def census(blocks: Array[Array[Int]]): (Long, Long, Long) = {
    var dc = 0L; var nz = 0L; var ws = 0L
    blocks.zipWithIndex.foreach { case (blk, b) =>
      dc += blk(0)
      ws += blk(0).toLong * (b * 64L + 1L)
      for (k <- 1 until 64; if blk(k) != 0) {
        nz += 1
        ws += blk(k).toLong * (b * 64L + k + 1L)
      }
    }
    (dc, nz, ws)
  }

  test("coefficient round trip: DC prediction, sparse ACs, ZRL runs, " +
      "negative values — census exact") {
    val blocks = Array.tabulate(24) { b =>
      val zz = new Array[Int](64)
      zz(0) = (b * 37) % 256 - 128
      zz(1 + b % 5) = (b * 7) % 31 - 15
      zz(50 + b % 10) = 1 + b % 7
      zz
    }
    val f = JpegScratch.decode(1L,
      JpegScratch.encodeCoeffs(48, 32, blocks))
    val (dc, nz, ws) = census(blocks)
    assert(f.n_blocks == 24 && f.width == 48 && f.height == 32)
    assert((f.dc_sum, f.ac_nonzero, f.coeff_weighted) == (dc, nz, ws))
  }

  test("restart markers reset the DC prediction chain") {
    val dcs = Array(100, -50, 60, 7)
    val blocks = dcs.map { d =>
      val zz = new Array[Int](64); zz(0) = d; zz
    }
    val f = JpegScratch.decode(2L,
      JpegScratch.encodeCoeffs(32, 8, blocks, restartInterval = 2))
    assert(f.n_blocks == 4 && f.dc_sum == dcs.sum.toLong)
    // without the reset the decoder would resolve block 2 to -50+60
    val g = JpegScratch.decode(2L,
      JpegScratch.encodeCoeffs(32, 8, blocks))
    assert(g.dc_sum == f.dc_sum) // same census, different bitstreams
  }

  test("a dense block (all 64 coefficients nonzero) round trips") {
    val zz = Array.tabulate(64)(k => if (k == 0) 300 else (k % 9) - 4)
    // some of those ACs are zero — force all nonzero
    val dense = zz.zipWithIndex.map { case (v, k) =>
      if (k > 0 && v == 0) 1 else v
    }
    val f = JpegScratch.decode(3L,
      JpegScratch.encodeCoeffs(8, 8, Array(dense)))
    val (dc, nz, ws) = census(Array(dense))
    assert(f.n_blocks == 1 &&
      (f.dc_sum, f.ac_nonzero, f.coeff_weighted) == (dc, nz, ws))
  }

  test("INTEROP out: the JDK's ImageIO decodes the from-scratch " +
      "bitstream pixel-exactly on DC-only blocks") {
    val w = 32; val h = 16
    val gray = new Array[Byte](w * h)
    val cs = Array(40, 200, 128, 77, 13, 255, 0, 160)
    for (y <- 0 until h; x <- 0 until w) {
      val b = (y / 8) * 4 + x / 8
      gray(y * w + x) = cs(b).toByte
    }
    val jpg = JpegScratch.encodeGray8(w, h, gray)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == (gray(y * w + x) & 0xff),
        s"pixel ($x,$y)")
  }

  test("INTEROP out: gradient image survives ImageIO decode within " +
      "quantization tolerance (proves FDCT + zigzag are JPEG's own)") {
    val w = 16; val h = 16
    val gray = Array.tabulate(w * h)(p =>
      ((p % w) * 9 + (p / w) * 5).toByte)
    val jpg = JpegScratch.encodeGray8(w, h, gray)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpg))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val err = math.abs(
        raster.getSample(x, y, 0) - (gray(y * w + x) & 0xff))
      maxErr = math.max(maxErr, err)
    }
    // all-ones quant: the only loss is FDCT rounding (±0.5 per coeff)
    // plus the decoder's IDCT rounding — a few grey levels at most
    assert(maxErr <= 3, s"max pixel error $maxErr")
  }

  test("INTEROP in: the from-scratch decoder parses ImageIO's own " +
      "grayscale bitstream — foreign tables, foreign entropy data") {
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 11 + y * 23) % 256)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val f = JpegScratch.decode(4L, out.toByteArray)
    assert(f.n_blocks == 15, s"sentinel or wrong block count: $f")
    assert(f.width == w && f.height == h)
    // decode is deterministic: same input, same census
    val g = JpegScratch.decode(4L, out.toByteArray)
    assert((g.dc_sum, g.ac_nonzero, g.coeff_weighted) ==
      (f.dc_sum, f.ac_nonzero, f.coeff_weighted))
  }

  test("malformed classes yield the sentinel, never an exception") {
    val blocks = Array.tabulate(4) { b =>
      val zz = new Array[Int](64); zz(0) = b * 10; zz(3) = -5; zz
    }
    val good = JpegScratch.encodeCoeffs(32, 8, blocks)
    def bad(mutate: Array[Byte] => Array[Byte]): Unit =
      assert(JpegScratch.decode(9L, mutate(good.clone())).n_blocks == -1L)
    bad { b => b(1) = 0x00; b } // not SOI
    bad { b =>
      // SOF0 -> SOF2 (progressive): find FF C0 and flip
      val i = (0 until b.length - 1).find(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0).get
      b(i + 1) = 0xc2.toByte; b
    }
    bad(b => java.util.Arrays.copyOf(b, b.length - 4)) // EOI truncated
    bad { b => // trailing byte after EOI
      val out = java.util.Arrays.copyOf(b, b.length + 1)
      out(b.length) = 0x33; out
    }
    bad(b => java.util.Arrays.copyOf(b, 40)) // mid-header truncation
    assert(JpegScratch.decode(9L, Array.emptyByteArray).n_blocks == -1L)
    assert(JpegScratch.decode(9L,
      Array.fill(100)(0x55.toByte)).n_blocks == -1L)
  }
}
