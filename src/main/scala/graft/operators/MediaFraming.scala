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

/** REAL H.264 sequence-parameter-set decode (ITU-T H.264 §7.3.2.1):
  * the SPS is the one NAL whose payload is pure Exp-Golomb + fixed
  * bits — genuine entropy-coded syntax (ue(v) codes), no CABAC — and
  * it carries the stream geometry every video curation gate needs
  * (profile/level admission, dimension filters, aspect sanity). This
  * upgrades the m20 NAL census from framing-only to real header
  * DECODE: bit reader over the RBSP with emulation-prevention
  * (00 00 03 → 00 00) removal, ue(v) Exp-Golomb parse, cropped
  * 4:2:0 dimension arithmetic (CropUnitX = CropUnitY = 2 for
  * frame_mbs_only streams). The encoder writes the same syntax
  * (including emulation prevention), so decode-of-own-encode plus a
  * closed-form oracle is the round-trip proof — the c18/m22
  * discipline. Remaining behind the stub: slice RECONSTRUCTION
  * (CABAC/CAVLC residuals), the part that genuinely needs a codec
  * library.
  *
  * Totality: every malformed input (no SPS NAL, truncated bits,
  * ue(v) overflow, zero MB dims) yields the ok=0 sentinel row, never
  * a throw — one poison blob must not kill the job.
  */
object H264Sps {

  final case class SpsMeta(
      doc_id: Long,
      ok: Long,
      profile_idc: Long,
      level_idc: Long,
      width: Long,
      height: Long,
      n_mbs: Long)

  private def sentinel(id: Long) = SpsMeta(id, 0L, 0L, 0L, 0L, 0L, 0L)

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def u(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | (((v >> k) & 1L).toInt)
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        k -= 1
      }
    }
    /** Exp-Golomb ue(v): leadingZeros(⌊log2(v+1)⌋) then v+1. */
    def ue(v: Long): Unit = {
      val x = v + 1
      val bits = 63 - java.lang.Long.numberOfLeadingZeros(x)
      u(0L, bits)
      u(x, bits + 1)
    }
    def rbspTrailing(): Unit = { u(1L, 1); if (nbits != 0) u(0L, 8 - nbits) }
    def bytes(): Array[Byte] = out.toByteArray
  }

  private final class BitReader(rbsp: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) {
        val byteIx = pos >> 3
        if (byteIx >= rbsp.length) throw new IllegalArgumentException("eof")
        v = (v << 1) | ((rbsp(byteIx) >> (7 - (pos & 7))) & 1)
        pos += 1
        k += 1
      }
      v
    }
    def ue(): Long = {
      var zeros = 0
      while (u(1) == 0L) {
        zeros += 1
        if (zeros > 31) throw new IllegalArgumentException("ue overflow")
      }
      if (zeros == 0) 0L else ((1L << zeros) | u(zeros)) - 1
    }
  }

  /** RBSP → EBSP: insert 0x03 after any 00 00 followed by a byte ≤ 3. */
  private def addEmulationPrevention(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xff) <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** EBSP → RBSP: drop every 0x03 that follows 00 00. */
  private def stripEmulationPrevention(ebsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var zeros = 0
    var i = 0
    while (i < ebsp.length) {
      val b = ebsp(i)
      if (zeros >= 2 && b == 3) zeros = 0 // skip the marker
      else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** Annex-B stream holding one real SPS for a cropped 4:2:0
    * frame_mbs_only geometry. `width`/`height` must be even (4:2:0
    * crop units are 2 px); crop is applied at the right/bottom edge
    * exactly as an encoder does for non-multiple-of-16 dimensions.
    */
  def encode(width: Int, height: Int, profileIdc: Int,
      levelIdc: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"even positive dims required, got ${width}x$height")
    val mbsW = (width + 15) / 16
    val mbsH = (height + 15) / 16
    val cropRight = (mbsW * 16 - width) / 2
    val cropBottom = (mbsH * 16 - height) / 2
    val w = new BitWriter
    w.u(profileIdc.toLong, 8)
    w.u(0L, 8) // constraint flags + reserved
    w.u(levelIdc.toLong, 8)
    w.ue(0L) // seq_parameter_set_id
    // High profiles carry the chroma/bit-depth block (4:2:0, 8-bit,
    // no scaling lists) — mirrors the parser's §7.3.2.1.1 handling
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128,
        134, 135, 138, 139).contains(profileIdc)) {
      w.ue(1L) // chroma_format_idc = 4:2:0
      w.ue(0L) // bit_depth_luma_minus8
      w.ue(0L) // bit_depth_chroma_minus8
      w.u(0L, 1) // qpprime_y_zero_transform_bypass_flag
      w.u(0L, 1) // seq_scaling_matrix_present_flag
    }
    w.ue(0L) // log2_max_frame_num_minus4
    w.ue(0L) // pic_order_cnt_type
    w.ue(0L) // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1L) // max_num_ref_frames
    w.u(0L, 1) // gaps_in_frame_num_value_allowed_flag
    w.ue((mbsW - 1).toLong)
    w.ue((mbsH - 1).toLong)
    w.u(1L, 1) // frame_mbs_only_flag
    w.u(1L, 1) // direct_8x8_inference_flag
    val crop = cropRight > 0 || cropBottom > 0
    w.u(if (crop) 1L else 0L, 1)
    if (crop) {
      w.ue(0L); w.ue(cropRight.toLong)
      w.ue(0L); w.ue(cropBottom.toLong)
    }
    w.u(0L, 1) // vui_parameters_present_flag
    w.rbspTrailing()
    val ebsp = addEmulationPrevention(w.bytes())
    val out = new java.io.ByteArrayOutputStream()
    out.write(0); out.write(0); out.write(0); out.write(1)
    out.write(0x67) // nal_ref_idc=3, type=7 (SPS)
    out.write(ebsp, 0, ebsp.length)
    out.toByteArray
  }

  /** Find the first SPS NAL and decode its geometry; sentinel on any
    * malformation.
    */
  def parse(docId: Long, bytes: Array[Byte]): SpsMeta = {
    try {
      // locate the first start code followed by an SPS header
      var i = 0
      var spsStart = -1
      while (spsStart < 0 && i + 4 <= bytes.length) {
        if (bytes(i) == 0 && bytes(i + 1) == 0) {
          val off =
            if (bytes(i + 2) == 1) i + 3
            else if (i + 4 < bytes.length && bytes(i + 2) == 0 &&
              bytes(i + 3) == 1) i + 4
            else -1
          if (off > 0 && off < bytes.length &&
            (bytes(off) & 0x1f) == 7 && (bytes(off) & 0x80) == 0)
            spsStart = off + 1
          else i += 1
        } else i += 1
      }
      if (spsStart < 0) return sentinel(docId)
      // SPS body runs to the next start code or end of stream
      var e = spsStart
      while (e + 3 <= bytes.length &&
        !(bytes(e) == 0 && bytes(e + 1) == 0 &&
          (bytes(e + 2) == 1 || (e + 4 <= bytes.length &&
            bytes(e + 2) == 0 && bytes(e + 3) == 1)))) e += 1
      if (e + 3 > bytes.length) e = bytes.length
      val r = new BitReader(
        stripEmulationPrevention(bytes.slice(spsStart, e)))
      val profile = r.u(8)
      r.u(8) // constraint flags
      val level = r.u(8)
      r.ue() // sps id
      // High profiles (ITU-T H.264 §7.3.2.1.1) carry chroma format,
      // bit depths and optional scaling lists BEFORE
      // log2_max_frame_num_minus4 — skipping them would decode the
      // rest of the SPS to garbage dimensions with ok=1
      if (Set(100L, 110L, 122L, 244L, 44L, 83L, 86L, 118L, 128L,
          134L, 135L, 138L, 139L).contains(profile)) {
        val chromaFmt = r.ue()
        if (chromaFmt == 3L) r.u(1) // separate_colour_plane_flag
        r.ue() // bit_depth_luma_minus8
        r.ue() // bit_depth_chroma_minus8
        r.u(1) // qpprime_y_zero_transform_bypass_flag
        if (r.u(1) == 1L) // seq_scaling_matrix_present_flag
          return sentinel(docId) // scaling lists not parsed (poc==1 honesty)
      }
      r.ue() // log2_max_frame_num_minus4
      val poc = r.ue()
      if (poc == 0L) r.ue() // log2_max_pic_order_cnt_lsb_minus4
      else if (poc == 1L) return sentinel(docId) // not emitted here
      r.ue() // max_num_ref_frames
      r.u(1)
      val mbsW = r.ue() + 1
      val mbsH = r.ue() + 1
      if (mbsW <= 0 || mbsH <= 0 || mbsW > (1L << 16) || mbsH > (1L << 16))
        return sentinel(docId)
      val fmof = r.u(1)
      r.u(1) // direct_8x8
      var cl, cr, ct, cb = 0L
      if (r.u(1) == 1L) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
      val cropUnitY = 2L * (2L - fmof)
      val width = mbsW * 16 - 2 * (cl + cr)
      val height = (2L - fmof) * mbsH * 16 - cropUnitY * (ct + cb)
      if (width <= 0 || height <= 0) return sentinel(docId)
      SpsMeta(docId, 1L, profile, level, width, height, mbsW * mbsH)
    } catch { case _: Throwable => sentinel(docId) }
  }

  def extract(spark: SparkSession, binary: DataFrame): Dataset[SpsMeta] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => parse(id, b) })
  }
}
