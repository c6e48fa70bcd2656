package graft.operators

import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

/** The real PNG codec: encoder→decoder round-trips exercising every
  * filter type, hand-built grayscale/RGBA files, CRC verification,
  * and the malformed classes mapped to the sentinel.
  */
class PngCodecSpec extends AnyFunSuite {

  private def lumaOfRgb(rgb: Array[Byte]): Seq[Int] =
    rgb.grouped(3).map(p =>
      ((p(0) & 0xff) + (p(1) & 0xff) + (p(2) & 0xff)) / 3).toSeq

  test("encode→decode round-trip recovers exact pixels (filters 0-4)") {
    // 6 rows so the row%5 filter schedule hits every type incl. Paeth
    val w = 4; val h = 6
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val png = PngMediaCodec.encodeRgb8(w, h, rgb)
    val d = PngMediaCodec.decodeImage(png).get
    assert(d.w == w && d.h == h && d.bpp == 3)
    assert(d.pixels.toSeq == rgb.toSeq,
      "filter undo did not invert the filter schedule")
    val f = PngMediaCodec.decode(1L, png)
    assert(f.byte_sum == lumaOfRgb(rgb).map(_.toLong).sum)
  }

  // minimal hand-assembler for gray/RGBA cases (filter 0 rows)
  private def rawPng(w: Int, h: Int, colorType: Int,
      pixels: Array[Byte]): Array[Byte] = {
    val bpp = if (colorType == 0) 1 else if (colorType == 2) 3 else 4
    val raw = new Array[Byte]((w * bpp + 1) * h)
    for (y <- 0 until h)
      System.arraycopy(pixels, y * w * bpp, raw, y * (w * bpp + 1) + 1,
        w * bpp)
    val defl = new Deflater(); defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    def chunk(t: String, b: Array[Byte]) = {
      val tb = t.getBytes("US-ASCII")
      val c = new CRC32(); c.update(tb); c.update(b)
      be32(b.length.toLong) ++ tb ++ b ++ be32(c.getValue)
    }
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++
      chunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0)) ++
      chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("grayscale: samples are luma directly") {
    val png = rawPng(2, 1, 0, Array[Byte](10, 200.toByte))
    val f = PngMediaCodec.decode(2L, png)
    assert(f.byte_sum == 210L && f.h0 == 1L && f.h3 == 1L)
  }

  test("RGBA: alpha is ignored for luma") {
    val png = rawPng(1, 1, 6, Array[Byte](30, 60, 90, 0))
    assert(PngMediaCodec.decode(3L, png).byte_sum == 60L)
  }

  test("a flipped bit fails the chunk CRC and yields the sentinel") {
    val png = PngMediaCodec.encodeRgb8(2, 2,
      Array.fill[Byte](12)(50))
    val corrupt = png.clone()
    corrupt(40) = (corrupt(40) ^ 1).toByte
    assert(PngMediaCodec.decode(4L, corrupt).byte_sum == -1L)
  }

  test("malformed classes: signature, truncation, interlace, depth") {
    val good = PngMediaCodec.encodeRgb8(2, 2, Array.fill[Byte](12)(7))
    val interlaced = {
      // rebuild IHDR with interlace=1 (CRC recomputed so only the
      // interlace check can reject it)
      val w = 2; val h = 2
      val body = Array[Byte](((w >> 24) & 0xff).toByte, 0, 0, w.toByte,
        0, 0, 0, h.toByte, 8, 2, 0, 0, 1)
      val c = new CRC32(); c.update("IHDR".getBytes); c.update(body)
      val crc = c.getValue
      good.take(8) ++ Array[Byte](0, 0, 0, 13) ++
        "IHDR".getBytes("US-ASCII") ++ body ++
        Array(((crc >> 24) & 0xff).toByte, ((crc >> 16) & 0xff).toByte,
          ((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte) ++
        good.drop(8 + 25)
    }
    val cases = Seq(
      "not a png".getBytes("US-ASCII"),
      good.dropRight(20), // no IEND / truncated IDAT
      interlaced,
      Array.emptyByteArray)
    for (b <- cases)
      assert(PngMediaCodec.decode(9L, b).byte_sum == -1L,
        s"expected sentinel for ${b.length}B")
  }

  test("resize re-encodes a real PNG that decodes to the sampled pixel") {
    val rgb = Array[Byte](10, 20, 30, 100.toByte, 110.toByte, 120.toByte,
      1, 2, 3, 4, 5, 6)
    val png = PngMediaCodec.encodeRgb8(2, 2, rgb)
    val small = PngMediaCodec.resize(png, 1)
    val d = PngMediaCodec.decodeImage(small).get
    assert(d.w == 1 && d.h == 1)
    assert(d.pixels.toSeq == Seq[Byte](10, 20, 30))
  }

  test("aHash over decoded luma: above-mean bits") {
    val png = rawPng(4, 1, 0, Array[Byte](0, 0, 200.toByte, 200.toByte))
    val h = PngMediaCodec.perceptualHash(5L, png, 4)
    assert(h.n_samples == 4L && h.ahash == 12L)
  }

  test("FDICT zlib stream in IDAT terminates with the sentinel") {
    // zlib header 0x78 0x20: CMF=0x78, FLG has the FDICT bit set and a
    // valid FCHECK ((0x7820 % 31) == 0). Inflater then stalls with
    // got==0, needsInput()==false, needsDictionary()==true — a decode
    // loop that only bails on needsInput() spins forever here.
    val idat = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0, 0, 0, 0)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    def chunk(t: String, b: Array[Byte]) = {
      val tb = t.getBytes("US-ASCII")
      val c = new CRC32(); c.update(tb); c.update(b)
      be32(b.length.toLong) ++ tb ++ b ++ be32(c.getValue)
    }
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++
      chunk("IHDR", be32(2L) ++ be32(1L) ++ Array[Byte](8, 0, 0, 0, 0)) ++
      chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
    val done = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fut = done.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = PngMediaCodec.decode(13L, png).byte_sum
      })
      assert(fut.get(10, java.util.concurrent.TimeUnit.SECONDS) == -1L,
        "FDICT stream must map to the sentinel, not hang or decode")
    } finally done.shutdownNow()
  }
}
