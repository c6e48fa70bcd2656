package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** A REAL audio codec — RIFF/WAVE, decoding THREE genuine wire
  * formats with zero libraries:
  *
  *   - format tag 1: 16-bit PCM (uncompressed — pure byte math);
  *   - format tag 7: **G.711 μ-law** — real COMPRESSED audio
  *     (8-bit logarithmic companding, 2:1, the telephony standard);
  *     expansion is exact integer arithmetic, so the decoded
  *     features stay closed-form for the oracle;
  *   - format tag 0x11: **IMA ADPCM** — real PREDICTIVE compression
  *     (4-bit differential, 4:1, the classic games/voice codec):
  *     block-structured state (predictor + step index per block
  *     header, nibble-packed deltas), the standard step/index
  *     tables, exact integer decode. Mono only (the stereo word
  *     interleave is a layout variant, not new decoding — sentinel).
  *
  * The chunk walk is the genuine RIFF grammar: `RIFF<size>WAVE`,
  * then chunks `<id><size LE><payload>` with odd-size pad bytes, in
  * any order and with foreign chunks (LIST, INFO, …) skipped, until
  * both `fmt ` and `data` are found. Anything else — perceptual
  * codecs (MP3/AAC need real libraries), float PCM, truncated data —
  * yields the documented sentinel row (`n_samples = -1`), never an
  * exception.
  *
  * Features are per-frame over channel 0 (frame stride = blockAlign,
  * so stereo interleave is handled, not assumed away): sum of
  * absolute amplitude (the integer loudness mass), amplitude-
  * magnitude quartile histogram is NOT emitted (audio has its own
  * shape) — instead zero-crossing count, the classic cheap pitch/
  * noisiness proxy, with "crossing" defined sign-strictly
  * (`(s_i < 0) != (s_{i+1} < 0)`, zeros counted non-negative) so
  * both engines agree on every edge case.
  */
object WavCodec {

  /** Decoded-audio feature row: header facts + channel-0 stats.
    * `n_samples = -1` is the malformed sentinel.
    */
  final case class WavFeatures(
      doc_id: Long,
      n_bytes: Long,
      n_channels: Long,
      sample_rate: Long,
      n_samples: Long, // frames (per-channel samples)
      abs_sum: Long, // Σ |amplitude| over channel 0
      zero_crossings: Long)

  private def sentinel(docId: Long, n: Int) =
    WavFeatures(docId, n.toLong, 0L, 0L, -1L, 0L, 0L)

  @inline private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  @inline private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  @inline private def s16(b: Array[Byte], i: Int): Int =
    u16(b, i).toShort.toInt

  /** G.711 μ-law expansion (CCITT reference form): byte → 14-bit
    * linear sample in [-8031·4, +8031·4]-ish (max |32124|). Exact
    * integer — the oracle reproduces it closed-form.
    */
  @inline def ulawToLinear(byte: Byte): Int = {
    val u = (~byte) & 0xff
    val sign = u & 0x80
    val exp = (u >> 4) & 0x07
    val man = u & 0x0f
    val mag = (((man << 3) + 0x84) << exp) - 0x84
    if (sign != 0) -mag else mag
  }

  /** G.711 μ-law compression (reference segment search) — for the
    * generators and the round-trip spec.
    */
  def linearToUlaw(sample: Int): Byte = {
    val Bias = 0x84
    val Clip = 32635
    var s = sample
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > Clip) s = Clip
    s += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val man = (s >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | man)).toByte
  }

  // IMA ADPCM reference tables (IMA Digital Audio Pack, public spec)
  private val AdpcmIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
  private val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** One IMA ADPCM step: (predictor, index, nibble) → (sample,
    * index'). Exact integer per the IMA reference decoder.
    */
  @inline private def adpcmStep(pred: Int, index: Int,
      nibble: Int): (Int, Int) = {
    val step = AdpcmStepTable(index)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val s0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val s = math.max(-32768, math.min(32767, s0))
    val i2 = math.max(0, math.min(88, index + AdpcmIndexTable(nibble)))
    (s, i2)
  }

  /** Reference IMA ADPCM encoder (mono): 16-bit samples → blocks of
    * `blockAlign` bytes (4-byte header: predictor s16, step index,
    * reserved; then nibble-packed deltas, low nibble first). For the
    * generators and the tolerance spec — ADPCM is lossy.
    */
  def adpcmEncodeMono(samples: Array[Int], blockAlign: Int): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0)
    val perBlock = (blockAlign - 4) * 2 + 1
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    var index = 0
    while (pos < samples.length) {
      val block = new Array[Byte](blockAlign)
      var pred = samples(pos)
      block(0) = (pred & 0xff).toByte
      block(1) = ((pred >> 8) & 0xff).toByte
      block(2) = index.toByte
      block(3) = 0
      var k = 1 // header carries sample 0 verbatim
      var bi = 4
      var low = true
      while (k < perBlock) {
        val target =
          if (pos + k < samples.length) samples(pos + k) else 0
        // choose the nibble minimizing |decoded - target| (exhaustive
        // 16-way — reference-quality, clarity over speed)
        var best = 0
        var bestErr = Long.MaxValue
        var n = 0
        while (n < 16) {
          val (s, _) = adpcmStep(pred, index, n)
          val e = math.abs(s.toLong - target)
          if (e < bestErr) { bestErr = e; best = n }
          n += 1
        }
        val (s, i2) = adpcmStep(pred, index, best)
        pred = s; index = i2
        if (low) block(bi) = (best & 0x0f).toByte
        else { block(bi) = (block(bi) | (best << 4)).toByte; bi += 1 }
        low = !low
        k += 1
      }
      out.write(block)
      pos += perBlock
    }
    out.toByteArray
  }

  /** RIFF/WAVE container writer for the three supported formats —
    * real headers for the generators: `fmtTag` 1 (PCM16), 7 (μ-law)
    * or 0x11 (IMA ADPCM, needs `samplesPerBlock`).
    */
  def wavContainer(fmtTag: Int, channels: Int, rate: Int,
      bitsPerSample: Int, blockAlign: Int, data: Array[Byte],
      samplesPerBlock: Int = 0): Array[Byte] = {
    val extra = if (fmtTag == 0x11) 4 else 0
    val fmtLen = 16 + extra
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { var i = 0; while (i < 4) {
      bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    bos.write("RIFF".getBytes("US-ASCII"))
    w32(4L + 8 + fmtLen + 8 + data.length)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII"))
    w32(fmtLen.toLong)
    w16(fmtTag); w16(channels); w32(rate.toLong)
    w32(rate.toLong * blockAlign); w16(blockAlign); w16(bitsPerSample)
    if (fmtTag == 0x11) { w16(2); w16(samplesPerBlock) }
    bos.write("data".getBytes("US-ASCII"))
    w32(data.length.toLong)
    bos.write(data)
    if ((data.length & 1) == 1) bos.write(0) // RIFF word padding
    bos.toByteArray
  }

  def decode(docId: Long, bytes: Array[Byte]): WavFeatures = {
    val n = bytes.length
    if (n < 12 || bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
        bytes(10) != 'V' || bytes(11) != 'E')
      return sentinel(docId, n)
    var i = 12
    var channels = -1
    var rate = -1L
    var blockAlign = -1
    var fmtTag = -1
    var dataOff = -1
    var dataLen = -1L
    while (i + 8 <= n && (channels < 0 || dataOff < 0)) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = u32(bytes, i + 4)
      val body = i + 8
      if (body + size > n) return sentinel(docId, n) // truncated chunk
      if (id == "fmt ") {
        if (size < 16) return sentinel(docId, n)
        fmtTag = u16(bytes, body)
        val bits = u16(bytes, body + 14)
        channels = u16(bytes, body + 2)
        rate = u32(bytes, body + 4)
        blockAlign = u16(bytes, body + 12)
        val ok = fmtTag match {
          case 1 => bits == 16 && channels >= 1 &&
            blockAlign == 2 * channels
          case 7 => bits == 8 && channels >= 1 &&
            blockAlign == channels
          case 0x11 => bits == 4 && channels == 1 &&
            blockAlign >= 8 && blockAlign % 4 == 0
          case _ => false // perceptual codecs / float PCM: sentinel
        }
        if (!ok) return sentinel(docId, n)
      } else if (id == "data") {
        dataOff = body
        dataLen = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      i = body + size.toInt + (size.toInt & 1)
    }
    if (channels < 0 || dataOff < 0) return sentinel(docId, n)
    var absSum = 0L
    var zc = 0L
    var prevNeg = false
    var frames = 0L
    @inline def feed(s: Int): Unit = {
      absSum += math.abs(s.toLong)
      val neg = s < 0
      if (frames > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      frames += 1
    }
    fmtTag match {
      case 1 =>
        val fr = (dataLen / blockAlign).toInt
        var f = 0
        while (f < fr) { feed(s16(bytes, dataOff + f * blockAlign)); f += 1 }
      case 7 =>
        val fr = (dataLen / blockAlign).toInt
        var f = 0
        while (f < fr) {
          feed(ulawToLinear(bytes(dataOff + f * blockAlign))) // channel 0
          f += 1
        }
      case 0x11 =>
        // block-structured: 4-byte header (predictor, step index),
        // then nibble-packed deltas, low nibble first
        var blk = 0
        val nBlocks = (dataLen / blockAlign).toInt
        while (blk < nBlocks) {
          val off = dataOff + blk * blockAlign
          var pred = s16(bytes, off)
          var index = bytes(off + 2) & 0xff
          if (index > 88) return sentinel(docId, n)
          feed(pred) // header carries sample 0 verbatim
          var bi = off + 4
          val end = off + blockAlign
          while (bi < end) {
            val b = bytes(bi) & 0xff
            val (s1, i1) = adpcmStep(pred, index, b & 0x0f)
            pred = s1; index = i1; feed(s1)
            val (s2, i2) = adpcmStep(pred, index, (b >> 4) & 0x0f)
            pred = s2; index = i2; feed(s2)
            bi += 1
          }
          blk += 1
        }
      case _ => return sentinel(docId, n)
    }
    WavFeatures(docId, n.toLong, channels.toLong, rate, frames,
      absSum, zc)
  }

  /** Batched decode over a (doc_id, payload) projection — the same
    * mapPartitions boundary as [[BinaryDecode.extractFeatures]]: the
    * wide audio payload dies here, a fixed-width row flows on.
    */
  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[WavFeatures] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decode(id, b) })
  }
}
