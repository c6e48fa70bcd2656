package graft.operators

import graft.operators.BinaryDecode.{MediaFeatures, PerceptualHash}

/** A REAL second entropy codec with zero libraries: GIF — LZW with
  * variable-width codes is genuine entropy coding (the other one in
  * the engine is PNG's DEFLATE), and everything else in GIF is byte
  * arithmetic. Because GIF is LOSSLESS, the oracle discipline is
  * m13's, not m15's: decoded pixels are closed-form from the
  * generator, so the hash-match proves the ENTIRE
  * encode→LZW→decode→palette loop pixel for pixel.
  *
  * Decode is the genuine format:
  *   - `GIF87a`/`GIF89a` signature + logical screen descriptor +
  *     global color table (size from the packed field);
  *   - block walk: extensions (0x21) skipped by their sub-block
  *     chain, image descriptor (0x2C) with optional local color
  *     table, trailer (0x3B);
  *   - the image data: LZW minimum code size byte, then sub-block
  *     framed code stream — decoded with the real algorithm
  *     (little-endian bit packing, clear/EOI codes, dynamic table
  *     growth 9→12 bits, the deferred-clear rule, the KwKwK case);
  *   - interlace is refused (sentinel), like PNG's interlace.
  *
  * [[encodeGray8]] is a real LZW encoder (dynamic table, width
  * growth, table-full clear) over a 256-gray global palette, so the
  * round trip exercises the entire code path on real data.
  *
  * Malformed payloads (bad signature, truncated sub-blocks, code
  * overflow, missing trailer) yield the sentinel, never an
  * exception.
  */
object GifMediaCodec extends MediaCodec {

  private[operators] final case class Decoded(
      w: Int, h: Int, pixels: Array[Byte]) // luma per pixel (palette-resolved)

  private[operators] def decodeImage(bytes: Array[Byte]): Option[Decoded] = {
    val n = bytes.length
    if (n < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    @inline def u16(i: Int): Int =
      (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    var i = 6
    i += 4 // logical screen w/h (per-image descriptor is authoritative)
    val packed = bytes(i) & 0xff
    i += 3 // packed, bg color, aspect
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val size = 2 << (packed & 0x07)
      if (i + 3 * size > n) return None
      gct = Array.tabulate(size) { k =>
        ((bytes(i + 3 * k) & 0xff) + (bytes(i + 3 * k + 1) & 0xff) +
          (bytes(i + 3 * k + 2) & 0xff)) / 3
      }
      i += 3 * size
    }
    while (i < n) {
      (bytes(i) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label + sub-block chain
          i += 2
          while (i < n && bytes(i) != 0) {
            i += 1 + (bytes(i) & 0xff)
            if (i > n) return None
          }
          if (i >= n) return None
          i += 1 // block terminator
        case 0x2c =>
          if (i + 10 > n) return None
          val w = u16(i + 5)
          val h = u16(i + 7)
          val ipacked = bytes(i + 9) & 0xff
          i += 10
          if ((ipacked & 0x40) != 0) return None // interlace refused
          var palette = gct
          if ((ipacked & 0x80) != 0) {
            val size = 2 << (ipacked & 0x07)
            if (i + 3 * size > n) return None
            palette = Array.tabulate(size) { k =>
              ((bytes(i + 3 * k) & 0xff) + (bytes(i + 3 * k + 1) & 0xff) +
                (bytes(i + 3 * k + 2) & 0xff)) / 3
            }
            i += 3 * size
          }
          if (palette == null || w < 1 || h < 1 ||
            w.toLong * h > (1L << 26)) return None
          // collect the sub-block framed LZW stream
          if (i >= n) return None
          val minCode = bytes(i) & 0xff
          i += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          var blk = if (i < n) bytes(i) & 0xff else -1
          while (blk > 0) {
            if (i + 1 + blk > n) return None
            data.write(bytes, i + 1, blk)
            i += 1 + blk
            blk = if (i < n) bytes(i) & 0xff else -1
          }
          if (blk != 0) return None // truncated (no 0 terminator)
          val idx = lzwDecode(data.toByteArray, minCode, w * h)
            .getOrElse(return None)
          val px = new Array[Byte](w * h)
          var p = 0
          while (p < w * h) {
            val ci = idx(p)
            if (ci >= palette.length) return None
            px(p) = palette(ci).toByte
            p += 1
          }
          return Some(Decoded(w, h, px)) // first frame is the feature
        case _ => return None
      }
    }
    None // no image block
  }

  /** Real GIF-flavor LZW decode: little-endian bit reader, dynamic
    * dictionary as (prefix, appended byte) pairs, width growth at
    * table sizes 2^k, clear resets, the first-code and KwKwK rules.
    * Returns exactly `expect` indices or None.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
      expect: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var next = eoi + 1
    var width = minCode + 1
    val out = new Array[Int](expect)
    var outAt = 0
    var bitBuf = 0L
    var bitCnt = 0
    var at = 0
    var prev = -1
    def emit(code: Int): Boolean = {
      // expand code to its byte chain (reversed), bounded
      var stack = List.empty[Int]
      var c = code
      while (c >= clear + 2) {
        stack = append(c) :: stack
        c = prefix(c)
        if (stack.length > 4096) return false
      }
      stack = c :: stack
      stack.foreach { b =>
        if (outAt < expect) { out(outAt) = b; outAt += 1 }
      }
      true
    }
    def firstByte(code: Int): Int = {
      var c = code
      while (c >= clear + 2) c = prefix(c)
      c
    }
    while (outAt < expect) {
      while (bitCnt < width) {
        if (at >= data.length) return None // ran out of codes
        bitBuf |= (data(at) & 0xffL) << bitCnt
        bitCnt += 8
        at += 1
      }
      val code = (bitBuf & ((1 << width) - 1)).toInt
      bitBuf >>= width
      bitCnt -= width
      if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return if (outAt == expect) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be literal
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > next || (code == next && next >= 4096)) return None
        if (code == next) {
          // KwKwK: the code names the entry being defined right now —
          // add prev+first(prev), then emit that new entry
          prefix(next) = prev; append(next) = firstByte(prev)
          next += 1
          if (!emit(code)) return None
        } else {
          if (next < 4096) {
            prefix(next) = prev; append(next) = firstByte(code)
            next += 1
          }
          if (!emit(code)) return None
        }
        prev = code
        // the decoder's dictionary adds LAG the encoder's by exactly
        // one code (the first literal after a clear adds nothing), so
        // the decoder widens one entry early — the classic GIF
        // (1<<width)-1 rule
        if (next >= (1 << width) - 1 && width < 12) width += 1
      }
    }
    Some(out)
  }

  /** Real LZW encoder over 8-bit indices (minCode 8): dynamic
    * dictionary keyed by (prefixCode, byte), width growth in step
    * with the decoder, clear emitted when the table fills.
    */
  private def lzwEncode(indices: Array[Byte]): Array[Byte] = {
    val minCode = 8
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>= 8
        bitCnt -= 8
      }
    }
    var table = new scala.collection.mutable.LongMap[Int]()
    var next = eoi + 1
    put(clear)
    var cur = -1
    var i = 0
    while (i < indices.length) {
      val b = indices(i) & 0xff
      if (cur < 0) cur = b
      else {
        val key = (cur.toLong << 8) | b
        table.get(key) match {
          case Some(hit) => cur = hit
          case None =>
            put(cur)
            if (next < 4096) {
              table.put(key, next)
              next += 1
              // grow in lockstep with the decoder: it widens as soon
              // as its post-add next reaches 1<<width
              if (next >= (1 << width) && width < 12) width += 1
            } else {
              put(clear)
              table = new scala.collection.mutable.LongMap[Int]()
              next = eoi + 1
              width = minCode + 1
            }
            cur = b
        }
      }
      i += 1
    }
    if (cur >= 0) put(cur)
    put(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** Real GIF89a encoder for 8-bit GRAY images: 256-entry gray global
    * color table (palette[i] = (i,i,i)), LZW-compressed indices in
    * 255-byte sub-blocks.
    */
  def encodeGray8(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0x80 | 0x07) // GCT present, 256 entries
    out.write(0); out.write(0)
    var k = 0
    while (k < 256) { out.write(k); out.write(k); out.write(k); k += 1 }
    out.write(0x2c) // image descriptor
    w16(0); w16(0); w16(w); w16(h)
    out.write(0) // no LCT, no interlace
    out.write(8) // LZW minimum code size
    val lzw = lzwEncode(gray)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len)
      out.write(lzw, off, len)
      off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  override def decode(docId: Long, bytes: Array[Byte]): MediaFeatures =
    decodeImage(bytes) match {
      case None =>
        MediaFeatures(docId, bytes.length.toLong, -1L, 0L, 0L, 0L, 0L)
      case Some(d) =>
        var sum = 0L
        val hist = new Array[Long](4)
        var p = 0
        while (p < d.pixels.length) {
          val l = d.pixels(p) & 0xff
          sum += l
          hist(l >> 6) += 1
          p += 1
        }
        MediaFeatures(docId, bytes.length.toLong, sum, hist(0), hist(1),
          hist(2), hist(3))
    }

  /** Nearest-neighbor resample re-encoded as a real GIF. */
  override def resize(bytes: Array[Byte], target: Int): Array[Byte] =
    decodeImage(bytes) match {
      case None => Array.emptyByteArray
      case Some(d) =>
        val t = math.max(1, target)
        val out = new Array[Byte](t * t)
        var y = 0
        while (y < t) {
          var x = 0
          while (x < t) {
            out(y * t + x) = d.pixels(
              (y.toLong * d.h / t).toInt * d.w +
                (x.toLong * d.w / t).toInt)
            x += 1
          }
          y += 1
        }
        encodeGray8(t, t, out)
    }

  override def perceptualHash(docId: Long, bytes: Array[Byte],
      grid: Int): PerceptualHash =
    decodeImage(bytes) match {
      case None => PerceptualHash(docId, 0L, 0L)
      case Some(d) =>
        val total = d.w * d.h
        val n = math.min(grid, total)
        val s = new Array[Int](n)
        var sum = 0L
        var i = 0
        while (i < n) {
          s(i) = d.pixels((i.toLong * total / n).toInt) & 0xff
          sum += s(i)
          i += 1
        }
        var hash = 0L
        i = 0
        while (i < n) {
          if (s(i).toLong * n > sum) hash |= (1L << i)
          i += 1
        }
        PerceptualHash(docId, n.toLong, hash)
    }
}
