package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** A REAL audio codec — RIFF/WAVE with 16-bit PCM is uncompressed,
  * so decode is pure byte arithmetic and runs for real in this
  * container (the audio sibling of [[PpmMediaCodec]]). The chunk
  * walk is the genuine RIFF grammar: `RIFF<size>WAVE`, then chunks
  * `<id><size LE><payload>` with odd-size pad bytes, in any order
  * and with foreign chunks (LIST, INFO, …) skipped, until both
  * `fmt ` (validated: PCM format tag 1, 16-bit samples, sane
  * channel count) and `data` are found. Anything else — compressed
  * codecs (MP3/AAC/FLAC need libraries this container does not
  * ship), float PCM, truncated data — yields the documented sentinel
  * row (`n_samples = -1`), never an exception.
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
    var dataOff = -1
    var dataLen = -1L
    while (i + 8 <= n && (channels < 0 || dataOff < 0)) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = u32(bytes, i + 4)
      val body = i + 8
      if (body + size > n) return sentinel(docId, n) // truncated chunk
      if (id == "fmt ") {
        if (size < 16) return sentinel(docId, n)
        val fmtTag = u16(bytes, body)
        val bits = u16(bytes, body + 14)
        channels = u16(bytes, body + 2)
        rate = u32(bytes, body + 4)
        blockAlign = u16(bytes, body + 12)
        if (fmtTag != 1 || bits != 16 || channels < 1 ||
            blockAlign != 2 * channels)
          return sentinel(docId, n) // compressed / float / broken PCM
      } else if (id == "data") {
        dataOff = body
        dataLen = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      i = body + size.toInt + (size.toInt & 1)
    }
    if (channels < 0 || dataOff < 0) return sentinel(docId, n)
    val frames = (dataLen / blockAlign).toInt
    var absSum = 0L
    var zc = 0L
    var prevNeg = false
    var f = 0
    while (f < frames) {
      val s = s16(bytes, dataOff + f * blockAlign) // channel 0
      absSum += math.abs(s.toLong)
      val neg = s < 0
      if (f > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      f += 1
    }
    WavFeatures(docId, n.toLong, channels.toLong, rate, frames.toLong,
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
