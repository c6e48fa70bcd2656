package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

import graft.operators.BinaryDecode.{MediaFeatures, PerceptualHash}

/** A REAL **compressed**-format image codec — PNG, with zero external
  * libraries: DEFLATE ships in every JDK (`java.util.zip.Inflater`/
  * `Deflater`) and everything else in PNG is pure byte arithmetic.
  * This retires the last over-broad claim in the codec tier: "PNG is
  * environment-bound" was never true on a JVM.
  *
  * Decode is the genuine format, not a subset of convenience:
  *   - signature + chunk walk (`length BE, type, data, CRC32`), CRC
  *     VERIFIED on every chunk (a flipped bit yields the sentinel,
  *     exactly what a 100 TB ingest wants from corrupt blobs);
  *   - IHDR validation: 8-bit depth, color types 0 (gray), 2 (RGB),
  *     6 (RGBA), no interlace; multiple IDAT chunks concatenated
  *     before inflation (the spec allows any split);
  *   - zlib inflation of the filtered scanlines, then the REAL
  *     per-row filter undo — all five filter types (None/Sub/Up/
  *     Average/Paeth) implemented bytewise with the spec's
  *     truncating average and Paeth predictor.
  *
  * [[encodeRgb8]] is a real encoder (used by the m13/m14 generator
  * and [[resize]]): rows are written with filter `row % 5`, so a
  * decode of an encoded image exercises every filter type on real
  * data — the round-trip IS the filter-correctness test, and the
  * oracle checks it end-to-end because the decoded FEATURES are
  * closed-form even though the deflate bytes are not.
  *
  * Implements [[MediaCodec]], so the m-pack plumbing (mapPartitions
  * boundary, fixed-width outputs) is shared with the stub and the
  * PPM codec unchanged: luma features (m09's quartile layout),
  * nearest-neighbor resize re-emitted as a real PNG, aHash over
  * decoded luma samples.
  */
object PngMediaCodec extends MediaCodec {

  private val SIG =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  @inline private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Decoded image: width, height, bytes-per-pixel, unfiltered
    * pixel bytes (row-major, no filter bytes).
    */
  private[operators] final case class Decoded(
      w: Int, h: Int, bpp: Int, pixels: Array[Byte])

  private[operators] def decodeImage(bytes: Array[Byte]): Option[Decoded] = {
    val n = bytes.length
    if (n < 8 || !SIG.indices.forall(i => bytes(i) == SIG(i))) return None
    var i = 8
    var w = -1
    var h = -1
    var bpp = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (i + 12 <= n && !sawEnd) {
      val len = be32(bytes, i)
      if (len > Int.MaxValue - 12 || i + 12 + len > n) return None
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, i + 4, 4 + len.toInt)
      if (crc.getValue != be32(bytes, i + 8 + len.toInt)) return None
      val body = i + 8
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(bytes, body).toInt
          h = be32(bytes, body + 4).toInt
          val depth = bytes(body + 8) & 0xff
          val color = bytes(body + 9) & 0xff
          val (comp, filt, inter) = (bytes(body + 10), bytes(body + 11),
            bytes(body + 12))
          if (depth != 8 || comp != 0 || filt != 0 || inter != 0)
            return None
          bpp = color match {
            case 0 => 1
            case 2 => 3
            case 6 => 4
            case _ => return None
          }
          if (w < 1 || h < 1 || w.toLong * h * bpp > (1L << 28))
            return None
        case "IDAT" => idat.write(bytes, body, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      i = body + len.toInt + 4
    }
    if (!sawEnd || w < 0 || bpp < 0) return None
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val got = inf.inflate(raw, off, raw.length - off)
        // truncated stream, or FDICT-bearing zlib header (needsDictionary
        // stalls inflate with got==0 and needsInput()==false — without this
        // bail-out the loop would spin forever on a crafted IDAT)
        if (got == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None
        off += got
      }
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // per-row filter undo, bytewise; left neighbor is x - bpp
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(src + x) & 0xff
        val a = if (x >= bpp) px(dst + x - bpp) & 0xff else 0
        val b = if (y > 0) px(dst - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) px(dst - stride + x - bpp) & 0xff
          else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val (pa, pb, pc) =
              (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        px(dst + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Decoded(w, h, bpp, px))
  }

  @inline private def lumaAt(d: Decoded, p: Int): Int = d.bpp match {
    case 1 => d.pixels(p) & 0xff
    case _ =>
      val j = d.bpp * p // RGBA: alpha ignored for luma
      ((d.pixels(j) & 0xff) + (d.pixels(j + 1) & 0xff) +
        (d.pixels(j + 2) & 0xff)) / 3
  }

  override def decode(docId: Long, bytes: Array[Byte]): MediaFeatures =
    decodeImage(bytes) match {
      case None =>
        MediaFeatures(docId, bytes.length.toLong, -1L, 0L, 0L, 0L, 0L)
      case Some(d) =>
        val n = d.w * d.h
        var sum = 0L
        val hist = new Array[Long](4)
        var p = 0
        while (p < n) {
          val l = lumaAt(d, p)
          sum += l
          hist(l >> 6) += 1
          p += 1
        }
        MediaFeatures(docId, bytes.length.toLong, sum, hist(0), hist(1),
          hist(2), hist(3))
    }

  /** Real PNG encoder for 8-bit RGB: rows filtered with `row % 5`
    * (every filter type exercised), zlib-deflated, CRC'd chunks.
    */
  def encodeRgb8(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val a = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff
          else 0
        val enc = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val (pa, pb, pc) =
              (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflated = {
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
      try {
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length + 64)
        val out = new java.io.ByteArrayOutputStream()
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      } finally d.end()
    }
    def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(t); crc.update(body)
      be32bytes(body.length.toLong) ++ t ++ body ++ be32bytes(crc.getValue)
    }
    val ihdr = be32bytes(w.toLong) ++ be32bytes(h.toLong) ++
      Array[Byte](8, 2, 0, 0, 0)
    SIG ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.emptyByteArray)
  }

  private def be32bytes(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Nearest-neighbor resample to `target`×`target`, re-encoded as a
    * real PNG (RGB; gray/RGBA inputs are expanded/flattened to RGB).
    */
  override def resize(bytes: Array[Byte], target: Int): Array[Byte] =
    decodeImage(bytes) match {
      case None => Array.emptyByteArray
      case Some(d) =>
        val t = math.max(1, target)
        val out = new Array[Byte](t * t * 3)
        var y = 0
        while (y < t) {
          val sy = y * d.h / t
          var x = 0
          while (x < t) {
            val sp = sy * d.w + x * d.w / t
            val j = (y * t + x) * 3
            if (d.bpp == 1) {
              val v = d.pixels(sp)
              out(j) = v; out(j + 1) = v; out(j + 2) = v
            } else {
              val k = d.bpp * sp
              out(j) = d.pixels(k)
              out(j + 1) = d.pixels(k + 1)
              out(j + 2) = d.pixels(k + 2)
            }
            x += 1
          }
          y += 1
        }
        encodeRgb8(t, t, out)
    }

  override def perceptualHash(docId: Long, bytes: Array[Byte],
      grid: Int): PerceptualHash =
    decodeImage(bytes) match {
      case None => PerceptualHash(docId, 0L, 0L)
      case Some(d) =>
        val total = d.w * d.h
        val n = math.min(grid, total)
        val luma = new Array[Int](n)
        var sum = 0L
        var i = 0
        while (i < n) {
          luma(i) = lumaAt(d, (i.toLong * total / n).toInt)
          sum += luma(i)
          i += 1
        }
        var hash = 0L
        i = 0
        while (i < n) {
          if (luma(i).toLong * n > sum) hash |= (1L << i)
          i += 1
        }
        PerceptualHash(docId, n.toLong, hash)
    }
}
