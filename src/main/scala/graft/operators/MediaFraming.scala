package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REAL framing walks for the two formats whose ENTROPY decode
  * genuinely needs licensed/native libraries (MP3's polyphase+Huffman,
  * H.264's CABAC): production curation pipelines still parse their
  * CONTAINERS for real — duration, bitrate, frame/NAL census — to
  * gate, dedup and budget media WITHOUT decoding, and that walk is
  * pure public-spec byte arithmetic, same family as the WARC/tar/RIFF
  * walks. The perceptual payload stays behind [[StubMediaCodec]]; the
  * framing here is genuine and oracle-checkable closed-form.
  */
object Mp3Frames {

  /** Per-stream census from the frame-header walk. `n_frames = -1`
    * is the malformed sentinel.
    */
  final case class Mp3Meta(
      doc_id: Long,
      n_bytes: Long,
      n_frames: Long,
      bitrate_kbps_sum: Long, // Σ per-frame bitrate (VBR-aware census)
      duration_ms: Long) // 1152 samples per Layer III frame

  private def sentinel(docId: Long, n: Int) =
    Mp3Meta(docId, n.toLong, -1L, 0L, 0L)

  /** MPEG-1 Layer III bitrate table (kbps; index 0 = free, 15 = bad). */
  private[operators] val Bitrates: Array[Int] = Array(
    -1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
    320, -1)

  /** MPEG-1 sampling-rate table (Hz; index 3 = reserved). */
  private[operators] val SampleRates: Array[Int] =
    Array(44100, 48000, 32000, -1)

  /** Walk MPEG-1 Layer III frames: 11-bit sync, version/layer
    * validation, bitrate/samplerate table lookup, the spec's frame
    * length `144·bitrate/samplerate + padding`, hop to the next
    * header. ID3v2 prefix tags are skipped by their declared
    * syncsafe length (real files carry them). Truncated final
    * frames, bad indices, or a lost sync yield the sentinel.
    */
  def meta(docId: Long, bytes: Array[Byte]): Mp3Meta = {
    val n = bytes.length
    var i = 0
    // ID3v2 header: "ID3" vv flags + 4-byte syncsafe size
    if (n >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      i = 10 + size
      if (i > n) return sentinel(docId, n)
    }
    var frames = 0L
    var kbpsSum = 0L
    var samples = 0L
    var rate = -1
    while (i < n) {
      if (i + 4 > n) return sentinel(docId, n) // truncated header
      val b0 = bytes(i) & 0xff
      val b1 = bytes(i + 1) & 0xff
      val b2 = bytes(i + 2) & 0xff
      // sync (11 bits) + MPEG-1 (version bits 11) + Layer III (01)
      if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return sentinel(docId, n)
      if ((b1 & 0x18) != 0x18 || (b1 & 0x06) != 0x02)
        return sentinel(docId, n) // not MPEG-1 Layer III
      val br = Bitrates((b2 >> 4) & 0x0f)
      val sr = SampleRates((b2 >> 2) & 0x03)
      if (br < 0 || sr < 0) return sentinel(docId, n)
      if (rate < 0) rate = sr
      val padding = (b2 >> 1) & 1
      val frameLen = 144 * br * 1000 / sr + padding
      if (i + frameLen > n) return sentinel(docId, n) // truncated frame
      frames += 1
      kbpsSum += br
      samples += 1152L
      i += frameLen
    }
    if (frames == 0) sentinel(docId, n)
    else Mp3Meta(docId, n.toLong, frames, kbpsSum,
      samples * 1000L / rate)
  }

  /** Real frame synthesizer for the generators: valid MPEG-1 Layer
    * III headers with deterministic junk payloads (the entropy bytes
    * a decoder would Huffman-parse; the WALK must hop them by length
    * arithmetic alone).
    */
  def synthesize(bitrateIdx: Seq[Int], sampleRateIdx: Int,
      seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bitrateIdx.foreach { bi =>
      val br = Bitrates(bi)
      val sr = SampleRates(sampleRateIdx)
      val frameLen = 144 * br * 1000 / sr // padding 0
      out.write(0xff)
      out.write(0xfa) // sync + MPEG-1 + Layer III + no CRC
      out.write((bi << 4) | (sampleRateIdx << 2)) // no padding
      out.write(0xc0) // mono
      var j = 4
      while (j < frameLen) {
        out.write(((seed * 31 + j * 7) & 0x7f).toInt) // never 0xFF
        j += 1
      }
    }
    out.toByteArray
  }

  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[Mp3Meta] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => meta(id, b) })
  }
}

/** H.264 Annex-B NAL walk: byte-stream start codes (00 00 01 /
  * 00 00 00 01) delimit NAL units whose one-byte header carries
  * forbidden_zero_bit, nal_ref_idc and nal_unit_type — the census
  * (how many SPS/PPS, how many IDR vs non-IDR slices, payload bytes)
  * is what a video curation pipeline gates on without CABAC.
  */
object H264Nals {

  /** Per-stream NAL census. `n_nals = -1` is the malformed sentinel
    * (no start code, forbidden bit set, zero-length NAL).
    */
  final case class NalCensus(
      doc_id: Long,
      n_bytes: Long,
      n_nals: Long,
      n_sps: Long,
      n_pps: Long,
      n_idr: Long,
      n_nonidr: Long,
      payload_bytes: Long)

  private def sentinel(docId: Long, n: Int) =
    NalCensus(docId, n.toLong, -1L, 0L, 0L, 0L, 0L, 0L)

  def census(docId: Long, bytes: Array[Byte]): NalCensus = {
    val n = bytes.length
    // locate every start code; units run between them
    var i = 0
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (i + 3 <= n) {
      if (bytes(i) == 0 && bytes(i + 1) == 0) {
        if (bytes(i + 2) == 1) { starts += (i + 3); i += 3 }
        else if (i + 4 <= n && bytes(i + 2) == 0 && bytes(i + 3) == 1) {
          starts += (i + 4); i += 4
        } else i += 1
      } else i += 1
    }
    if (starts.isEmpty) return sentinel(docId, n)
    var sps = 0L
    var pps = 0L
    var idr = 0L
    var nonidr = 0L
    var payload = 0L
    var k = 0
    while (k < starts.length) {
      val s = starts(k)
      val e = if (k + 1 < starts.length) {
        // NAL body ends where the next start code BEGINS (strip its
        // 3- or 4-byte prefix, including the 4-byte form's extra 0)
        val next = starts(k + 1)
        if (next >= 4 && bytes(next - 4) == 0 && bytes(next - 3) == 0 &&
          bytes(next - 2) == 0) next - 4
        else next - 3
      } else n
      if (e <= s) return sentinel(docId, n) // zero-length NAL
      val hdr = bytes(s) & 0xff
      if ((hdr & 0x80) != 0) return sentinel(docId, n) // forbidden bit
      (hdr & 0x1f) match {
        case 7 => sps += 1
        case 8 => pps += 1
        case 5 => idr += 1
        case 1 => nonidr += 1
        case _ => () // SEI, AUD, … counted in the total only
      }
      payload += (e - s - 1).toLong
      k += 1
    }
    NalCensus(docId, n.toLong, starts.length.toLong, sps, pps, idr,
      nonidr, payload)
  }

  /** Annex-B synthesizer for the generators: 4-byte start code
    * before SPS/PPS (spec convention), 3-byte before slices; payload
    * bytes are ≥ 0x20 so no start-code emulation can occur.
    */
  def synthesize(nals: Seq[(Int, Int)], seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    nals.foreach { case (typ, payloadLen) =>
      if (typ == 7 || typ == 8) { out.write(0); out.write(0); out.write(0);
        out.write(1) }
      else { out.write(0); out.write(0); out.write(1) }
      val refIdc = if (typ == 5 || typ == 7 || typ == 8) 3 else 2
      out.write((refIdc << 5) | typ)
      var j = 0
      while (j < payloadLen) {
        out.write(0x20 + (((seed * 17 + j * 11) & 0x5f).toInt))
        j += 1
      }
    }
    out.toByteArray
  }

  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[NalCensus] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => census(id, b) })
  }
}
