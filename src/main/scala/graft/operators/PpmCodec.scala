package graft.operators

import graft.operators.BinaryDecode.{MediaFeatures, PerceptualHash}

/** A REAL image codec — no stub, no external library: binary PPM
  * ("P6", RGB) and PGM ("P5", grayscale) are uncompressed formats
  * whose decode is pure byte arithmetic, so this container CAN decode
  * them for real. The full netpbm header grammar is parsed — magic,
  * `#` comments, arbitrary whitespace runs, decimal width/height/
  * maxval, the single whitespace byte before pixel data — and pixel
  * payloads are validated against `width·height·channels`. Only
  * 1-byte samples (maxval ≤ 255) are supported; a 2-byte-sample file
  * (maxval > 255), a truncated payload, or a foreign magic yields the
  * documented SENTINEL feature row (`byte_sum = -1`) rather than an
  * exception — the [[MediaCodec]] totality contract (one poison blob
  * must not kill a 100 TB job).
  *
  * Kernels over DECODED PIXELS (not raw bytes):
  *   - decode: per-pixel integer luma `(r + g + b) div 3` (P5: the
  *     sample itself) — features are the luma sum + the 4-bin luma
  *     quartile histogram in the fixed [[MediaFeatures]] schema;
  *   - resize(target=t): nearest-neighbor resample to a t×t image,
  *     re-emitted as a VALID file of the same format (header
  *     rewritten, pixels sampled at `(x·w div t, y·h div t)`);
  *   - perceptualHash(grid=n): the classic aHash over n nearest-
  *     neighbor luma samples along the row-major pixel sequence
  *     (`p_i = i·(w·h) div n`), bit i set iff `luma_i · n > Σ luma`
  *     (integer cross-multiplication — division-free, portable).
  *
  * The m09/m10 queries generate closed-form P6 payloads in SQL and
  * the DuckDB oracle recomputes the features from that closed form —
  * a differential test: the general parser against the known layout,
  * hash-matched. JPEG/PNG/audio/video remain environment-bound (real
  * compressed codecs need libraries this container does not ship) and
  * keep the [[StubMediaCodec]] boundary.
  */
object PpmMediaCodec extends MediaCodec {

  /** (channels, width, height, maxval, pixelDataOffset), or None if
    * the payload is not a well-formed 1-byte-sample P5/P6.
    */
  private[operators] def parseHeader(
      b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (b.length < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6'))
      return None
    val channels = if (b(1) == '6') 3 else 1
    var i = 2
    def skipSeparators(): Boolean = {
      var progressed = false
      var go = true
      while (go && i < b.length) {
        val c = b(i)
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
          i += 1; progressed = true
        } else if (c == '#') { // comment runs to end of line
          while (i < b.length && b(i) != '\n') i += 1
          progressed = true
        } else go = false
      }
      progressed
    }
    def readInt(): Option[Int] = {
      if (!skipSeparators()) return None
      var v = 0L
      val start = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0')
        if (v > Int.MaxValue) return None
        i += 1
      }
      if (i == start) None else Some(v.toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      mx <- readInt()
      // exactly ONE whitespace byte separates maxval from pixel data
      if i < b.length && (b(i) == ' ' || b(i) == '\t' || b(i) == '\r' ||
        b(i) == '\n')
      _ = { i += 1 }
      if w >= 1 && h >= 1 && mx >= 1 && mx <= 255
      if b.length - i >= w.toLong * h * channels
    } yield (channels, w, h, mx, i)
  }

  /** Integer luma of pixel `p` (row-major). */
  @inline private def lumaAt(b: Array[Byte], off: Int, channels: Int,
      p: Int): Int =
    if (channels == 3) {
      val j = off + 3 * p
      ((b(j) & 0xff) + (b(j + 1) & 0xff) + (b(j + 2) & 0xff)) / 3
    } else b(off + p) & 0xff

  override def decode(docId: Long, bytes: Array[Byte]): MediaFeatures =
    parseHeader(bytes) match {
      case None =>
        // sentinel row: total decode, flagged not thrown
        MediaFeatures(docId, bytes.length.toLong, -1L, 0L, 0L, 0L, 0L)
      case Some((ch, w, h, _, off)) =>
        val n = w * h
        var sum = 0L
        val hist = new Array[Long](4)
        var p = 0
        while (p < n) {
          val l = lumaAt(bytes, off, ch, p)
          sum += l
          hist(l >> 6) += 1
          p += 1
        }
        MediaFeatures(docId, bytes.length.toLong, sum, hist(0), hist(1),
          hist(2), hist(3))
    }

  /** Nearest-neighbor resample to a `target`×`target` image of the
    * same format; malformed input yields an empty payload (sentinel).
    */
  override def resize(bytes: Array[Byte], target: Int): Array[Byte] =
    parseHeader(bytes) match {
      case None => Array.emptyByteArray
      case Some((ch, w, h, mx, off)) =>
        val t = math.max(1, target)
        val header = s"P${if (ch == 3) 6 else 5}\n$t $t\n$mx\n"
          .getBytes("US-ASCII")
        val out = new Array[Byte](header.length + t * t * ch)
        System.arraycopy(header, 0, out, 0, header.length)
        var y = 0
        var o = header.length
        while (y < t) {
          val sy = y * h / t
          var x = 0
          while (x < t) {
            val sx = x * w / t
            val sp = sy * w + sx
            var c = 0
            while (c < ch) {
              out(o) = bytes(off + ch * sp + c)
              o += 1; c += 1
            }
            x += 1
          }
          y += 1
        }
        out
    }

  /** aHash over `grid` nearest-neighbor luma samples of the decoded
    * image; malformed input hashes as 0 samples (sentinel).
    */
  override def perceptualHash(docId: Long, bytes: Array[Byte],
      grid: Int): PerceptualHash =
    parseHeader(bytes) match {
      case None => PerceptualHash(docId, 0L, 0L)
      case Some((ch, w, h, _, off)) =>
        val total = w * h
        val n = math.min(grid, total)
        val luma = new Array[Int](n)
        var sum = 0L
        var i = 0
        while (i < n) {
          luma(i) = lumaAt(bytes, off, ch, (i.toLong * total / n).toInt)
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
