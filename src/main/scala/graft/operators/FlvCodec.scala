package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REAL inter-frame video decode with zero external libraries: FLV /
  * Sorenson Screen Video 1 (codec id 3). Screen Video is the one
  * inter-frame video codec whose only compression is DEFLATE
  * (java.util.zip) — every block is a zlib stream of raw BGR pixels,
  * so a bare JVM can run the ENTIRE format for real: the FLV tag
  * walk, the bit-packed Screen Video header, per-block inflation,
  * and — the part no still-image codec exercises — temporal
  * composition: keyframes carry every block, inter frames carry only
  * the blocks that changed, and the decoded video is the
  * last-writer-wins overlay of the tag sequence.
  *
  * Decode is the genuine format (Adobe's public Video File Format
  * Specification v10, §E.4/§E.6.1):
  *   - FLV header: `FLV`, version 1, video flag, data offset;
  *     PreviousTagSize0 = 0; tag stream of (type, UI24 size, UI24+UI8
  *     timestamp, UI24 streamId=0, payload, UI32 prevTagSize) with
  *     audio/script tags skipped by size and every prevTagSize
  *     cross-checked;
  *   - VIDEODATA: frame type (1 key / 2 inter) + codec id (must be 3);
  *   - SCREENVIDEOPACKET: UB[4] blockWidth/16-1, UB[12] imageWidth,
  *     UB[4] blockHeight/16-1, UB[12] imageHeight; then one UB[16]
  *     dataSize per block — blocks ordered from the LOWER-left,
  *     left→right then bottom→top, edge blocks clipped to the image;
  *     dataSize 0 = block unchanged (illegal in a keyframe);
  *   - block payload: zlib BGR24, rows bottom-up within the block —
  *     inflated with the needsDictionary bail-out and an exact
  *     expected-size bound (a block that inflates short or long is
  *     malformed).
  *
  * The companion [[encode]] is a real encoder over the same spec, so
  * m23's oracle follows the m13/m21/m22 lossless discipline: the
  * final composed canvas is closed-form from the generator, and the
  * hash-match proves header bits, tag framing, inflation and the
  * inter-frame overlay without the oracle seeing an FLV byte. With
  * this, the stub's honest residue shrinks to perceptual-audio
  * payload reconstruction only (entropy-coded INTER-frame video —
  * H.264 CABAC — stays a census, but inter-frame video decode itself
  * is now real).
  *
  * Malformed payloads (bad signature/flags, truncated tags, wrong
  * codec id, inter frame first, prevTagSize mismatch, zlib bombs or
  * short blocks, dimension drift across frames) yield the sentinel
  * row, never an exception.
  */
object FlvScreenVideo {

  /** Composed-video feature row; `n_frames = -1` is the malformed
    * sentinel. `byte_sum`/`weighted_sum` are over the FINAL canvas
    * (image row-major, top-left origin) — `weighted_sum` is
    * order-sensitive, so a block composed at the wrong offset or a
    * stale block surviving a later write breaks the hash.
    */
  final case class SvFeatures(
      doc_id: Long,
      n_bytes: Long,
      n_frames: Long,
      n_keyframes: Long,
      blocks_updated: Long,
      byte_sum: Long,
      weighted_sum: Long)

  private def sentinel(docId: Long, n: Int) =
    SvFeatures(docId, n.toLong, -1L, 0L, 0L, 0L, 0L)

  /** One video frame in image space: `key` frames must carry every
    * block; inter frames carry only changed blocks. Block index k is
    * row-major from the TOP-left of the block grid (k = by*nbx+bx);
    * each block's pixels are gray bytes, block-local row-major from
    * the block's top-left, clipped to the image at edges. (The
    * BITSTREAM stores blocks and rows bottom-up per spec — encode and
    * decode both flip; callers never see bitstream order.)
    */
  final case class SvFrame(key: Boolean, blocks: Map[Int, Array[Byte]])

  private val MaxPixels = 1 << 24 // 16M px canvas cap (format max is 4095×4095)

  // --------------------------------------------------------------------
  // encode
  // --------------------------------------------------------------------

  /** Real FLV + Screen Video 1 encoder (gray in, BGR on the wire).
    * `blockW`/`blockH` must be multiples of 16 in 16..256 per spec.
    */
  def encode(w: Int, h: Int, blockW: Int, blockH: Int,
      frames: Seq[SvFrame]): Array[Byte] = {
    require(w >= 1 && h >= 1 && w < 4096 && h < 4096)
    require(blockW % 16 == 0 && blockW >= 16 && blockW <= 256)
    require(blockH % 16 == 0 && blockH >= 16 && blockH <= 256)
    require(frames.nonEmpty && frames.head.key, "first frame must be key")
    val nbx = (w + blockW - 1) / blockW
    val nby = (h + blockH - 1) / blockH
    val out = new java.io.ByteArrayOutputStream()
    out.write('F'); out.write('L'); out.write('V'); out.write(1)
    out.write(0x01) // video only
    def w32(v: Int): Unit = {
      out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    w32(9) // data offset
    w32(0) // PreviousTagSize0
    frames.zipWithIndex.foreach { case (fr, idx) =>
      val body = new java.io.ByteArrayOutputStream()
      body.write(((if (fr.key) 1 else 2) << 4) | 3) // frame type | codec 3
      body.write((((blockW / 16) - 1) << 4) | ((w >> 8) & 0x0f))
      body.write(w & 0xff)
      body.write((((blockH / 16) - 1) << 4) | ((h >> 8) & 0x0f))
      body.write(h & 0xff)
      // blocks from the lower-left, left→right then bottom→top
      var byBot = 0
      while (byBot < nby) {
        val byTop = nby - 1 - byBot
        var bx = 0
        while (bx < nbx) {
          val k = byTop * nbx + bx
          fr.blocks.get(k) match {
            case None =>
              require(!fr.key, s"keyframe missing block $k")
              body.write(0); body.write(0) // dataSize 0 = unchanged
            case Some(px) =>
              val bw = math.min(blockW, w - bx * blockW)
              val bh = math.min(blockH, h - byTop * blockH)
              require(px.length == bw * bh, s"block $k wrong size")
              // BGR rows bottom-up within the block
              val raw = new Array[Byte](3 * bw * bh)
              var rowBot = 0
              while (rowBot < bh) {
                val rowTop = bh - 1 - rowBot
                var x = 0
                while (x < bw) {
                  val g = px(rowTop * bw + x)
                  val at = 3 * (rowBot * bw + x)
                  raw(at) = g; raw(at + 1) = g; raw(at + 2) = g
                  x += 1
                }
                rowBot += 1
              }
              val defl = new java.util.zip.Deflater()
              defl.setInput(raw); defl.finish()
              val buf = new Array[Byte](raw.length + 64)
              var z = 0
              while (!defl.finished()) z += defl.deflate(buf, z, buf.length - z)
              defl.end()
              require(z <= 0xffff, "block zlib data exceeds UB[16]")
              body.write((z >> 8) & 0xff); body.write(z & 0xff)
              body.write(buf, 0, z)
          }
          bx += 1
        }
        byBot += 1
      }
      val data = body.toByteArray
      val ts = idx * 40 // 25 fps
      out.write(9) // video tag
      out.write((data.length >> 16) & 0xff)
      out.write((data.length >> 8) & 0xff)
      out.write(data.length & 0xff)
      out.write((ts >> 16) & 0xff); out.write((ts >> 8) & 0xff)
      out.write(ts & 0xff); out.write((ts >> 24) & 0xff)
      out.write(0); out.write(0); out.write(0) // stream id
      out.write(data, 0, data.length)
      w32(11 + data.length)
    }
    out.toByteArray
  }

  // --------------------------------------------------------------------
  // decode
  // --------------------------------------------------------------------

  def decode(docId: Long, bytes: Array[Byte]): SvFeatures = {
    val n = bytes.length
    if (n < 13 || bytes(0) != 'F' || bytes(1) != 'L' || bytes(2) != 'V' ||
      bytes(3) != 1) return sentinel(docId, n)
    if ((bytes(4) & 0x01) == 0) return sentinel(docId, n) // no video flag
    @inline def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    @inline def u24(i: Int): Int =
      ((bytes(i) & 0xff) << 16) | ((bytes(i + 1) & 0xff) << 8) |
        (bytes(i + 2) & 0xff)
    val dataOffset = u32(5)
    if (dataOffset < 9 || dataOffset + 4 > n) return sentinel(docId, n)
    var i = dataOffset.toInt
    if (u32(i) != 0L) return sentinel(docId, n) // PreviousTagSize0
    i += 4
    var canvas: Array[Byte] = null
    var imgW = -1; var imgH = -1; var blkW = -1; var blkH = -1
    var nFrames = 0L; var nKey = 0L; var updated = 0L
    while (i < n) {
      if (i + 11 > n) return sentinel(docId, n)
      val tagType = bytes(i) & 0xff
      val size = u24(i + 1)
      if (u24(i + 8) != 0) return sentinel(docId, n) // stream id
      val payload = i + 11
      if (payload + size + 4 > n) return sentinel(docId, n)
      if (u32(payload + size) != (11L + size)) return sentinel(docId, n)
      tagType match {
        case 8 | 18 => // audio / script data: skipped by size
        case 9 =>
          if (size < 5) return sentinel(docId, n)
          val ft = (bytes(payload) & 0xf0) >> 4
          val codec = bytes(payload) & 0x0f
          if (codec != 3 || (ft != 1 && ft != 2)) return sentinel(docId, n)
          val key = ft == 1
          if (canvas == null && !key) return sentinel(docId, n)
          val b0 = bytes(payload + 1) & 0xff
          val b1 = bytes(payload + 2) & 0xff
          val b2 = bytes(payload + 3) & 0xff
          val b3 = bytes(payload + 4) & 0xff
          val bw0 = ((b0 >> 4) + 1) * 16
          val w = ((b0 & 0x0f) << 8) | b1
          val bh0 = ((b2 >> 4) + 1) * 16
          val h = ((b2 & 0x0f) << 8) | b3
          if (w < 1 || h < 1 || w.toLong * h > MaxPixels)
            return sentinel(docId, n)
          if (canvas == null) {
            imgW = w; imgH = h; blkW = bw0; blkH = bh0
            canvas = new Array[Byte](w * h)
          } else if (w != imgW || h != imgH || bw0 != blkW || bh0 != blkH)
            return sentinel(docId, n) // dimension drift
          val nbx = (w + blkW - 1) / blkW
          val nby = (h + blkH - 1) / blkH
          var at = payload + 5
          val end = payload + size
          var byBot = 0
          while (byBot < nby) {
            val byTop = nby - 1 - byBot
            var bx = 0
            while (bx < nbx) {
              if (at + 2 > end) return sentinel(docId, n)
              val dsz = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
              at += 2
              if (dsz == 0) {
                if (key) return sentinel(docId, n) // keyframe must be full
              } else {
                if (at + dsz > end) return sentinel(docId, n)
                val bw = math.min(blkW, w - bx * blkW)
                val bh = math.min(blkH, h - byTop * blkH)
                val raw = inflateExact(bytes, at, dsz, 3 * bw * bh)
                  .getOrElse(return sentinel(docId, n))
                // BGR rows bottom-up → gray canvas rows top-down
                var rowBot = 0
                while (rowBot < bh) {
                  val y = byTop * blkH + (bh - 1 - rowBot)
                  var x = 0
                  while (x < bw) {
                    val p = 3 * (rowBot * bw + x)
                    val l = ((raw(p) & 0xff) + (raw(p + 1) & 0xff) +
                      (raw(p + 2) & 0xff)) / 3
                    canvas(y * w + bx * blkW + x) = l.toByte
                    x += 1
                  }
                  rowBot += 1
                }
                if (!key) updated += 1
                at += dsz
              }
              bx += 1
            }
            byBot += 1
          }
          if (at != end) return sentinel(docId, n) // trailing bytes in packet
          nFrames += 1
          if (key) nKey += 1
        case _ => return sentinel(docId, n)
      }
      i = payload + size + 4
    }
    if (canvas == null) return sentinel(docId, n)
    var sum = 0L; var wsum = 0L
    var p = 0
    while (p < canvas.length) {
      val l = canvas(p) & 0xff
      sum += l
      wsum += l.toLong * (p + 1)
      p += 1
    }
    SvFeatures(docId, n.toLong, nFrames, nKey, updated, sum, wsum)
  }

  /** Inflate exactly `expect` bytes from `bytes[off, off+len)`; None on
    * anything else — short output, overflow, preset-dictionary streams
    * (the needsDictionary spin guard), or corrupt zlib.
    */
  private def inflateExact(bytes: Array[Byte], off: Int, len: Int,
      expect: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(bytes, off, len)
      val out = new Array[Byte](expect + 1) // +1 detects oversize
      var at = 0
      var done = false
      while (!done && at <= expect) {
        val got = try inf.inflate(out, at, out.length - at)
        catch { case _: java.util.zip.DataFormatException => return None }
        at += got
        if (inf.finished()) done = true
        else if (got == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None
      }
      if (done && at == expect) Some(java.util.Arrays.copyOf(out, expect))
      else None
    } finally inf.end()
  }

  /** (doc_id, payload BINARY) → feature rows; the typed-boundary
    * discipline of every codec (PLANS §15): wide video dies at the
    * task, a fixed-width row flows on.
    */
  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[SvFeatures] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decode(id, b) })
  }
}
