package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REAL perceptual-audio PAYLOAD decode: MPEG-1 Audio Layer I
  * (ISO/IEC 11172-3). Layer I is a genuine psychoacoustic codec (the
  * MP3 family's simplest member, used by DCC) whose payload layer is
  * EXACT integer data: a 4-bit allocation per subband, a 6-bit
  * scalefactor index per allocated subband, and 12 linearly-quantized
  * sample codes of `nb` bits each — so unlike the m19 MP3 frame walk
  * (headers only), this decodes INSIDE the frame payload, bit for
  * bit, and every decoded quantity is closed-form for the oracle.
  *
  * Decode is the genuine format:
  *   - 32-bit header per frame: 12-bit syncword, ID=MPEG-1,
  *     layer='11' (Layer I), protection bit, bitrate index (Layer I
  *     table), sampling frequency, padding, mode — single-channel
  *     accepted, others sentinel;
  *   - frame length from the header as the spec computes it
  *     (N = (12·bitrate/fs + padding)·4 bytes) — the walk resyncs at
  *     header-declared boundaries, never by scanning;
  *   - CRC-16 (poly 0x8005, init 0xFFFF) over the last 16 header bits
  *     and the 128 allocation bits, exactly the Layer I protected
  *     span — a flipped allocation bit fails the check;
  *   - bit allocation: 4 bits × 32 subbands, value 15 forbidden,
  *     value a>0 → nb = a+1 bits per sample code;
  *   - 6-bit scalefactor index (0..62; 63 forbidden) per allocated
  *     subband;
  *   - sample codes in the spec's interleave (for each of 12 sample
  *     slots, all allocated subbands in order), remaining slot bits
  *     zero-padded to the frame boundary.
  *
  * The decoded payload census — allocated-subband count, scalefactor
  * sum, raw code sum, and a position-weighted code sum (the weight
  * names frame, slot and subband, so any mis-parse of the interleave
  * breaks it) — is the exact integer surface a training pipeline
  * reads (bitrate/energy/band-occupancy statistics). What stays out
  * of scope is only the float synthesis filterbank (pure DSP on the
  * decoded integers, no parsing left); the entropy/payload layer of
  * a perceptual audio format is decoded for REAL here.
  *
  * Malformed payloads (bad sync, wrong layer, forbidden bitrate or
  * allocation, CRC mismatch, truncated frames, trailing bytes) yield
  * the sentinel row, never an exception.
  */
object Mp1Codec {

  /** Payload-census feature row; `n_frames = -1` is the malformed
    * sentinel. `weighted_sum` = Σ code·(f·384 + q·32 + sb + 1) over
    * allocated (frame f, slot q, subband sb) — order-sensitive.
    */
  final case class Mp1Features(
      doc_id: Long,
      n_bytes: Long,
      n_frames: Long,
      kbps_sum: Long,
      n_alloc: Long,
      scf_sum: Long,
      code_sum: Long,
      weighted_sum: Long)

  private def sentinel(docId: Long, n: Int) =
    Mp1Features(docId, n.toLong, -1L, 0L, 0L, 0L, 0L, 0L)

  /** One mono Layer I frame in payload space: `alloc(sb)` is 0 (off)
    * or nb ∈ 2..15 (bits per code); `scf(sb)` ∈ 0..62 and
    * `codes(sb)(q)` ∈ [0, 2^nb) are read only where allocated.
    */
  final case class Mp1Frame(alloc: Array[Int], scf: Array[Int],
      codes: Array[Array[Int]])

  /** Layer I bitrate table (kbps), index 1..14; 0 is "free format"
    * (refused) and 15 is forbidden.
    */
  private val BitrateKbps =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
      416, 448)
  private val SampleRate = Array(44100, 48000, 32000)

  // ---- CRC-16: poly 0x8005, init 0xFFFF, bit-serial MSB-first -------
  private def crcBit(crc: Int, bit: Int): Int = {
    val fb = ((crc >> 15) & 1) ^ bit
    val sh = (crc << 1) & 0xffff
    if (fb == 1) sh ^ 0x8005 else sh
  }

  // --------------------------------------------------------------------
  // encode
  // --------------------------------------------------------------------

  /** Real Layer I encoder for single-channel streams at a fixed
    * bitrate/sample-rate index; payload bits must fit the header-
    * declared frame size (they always do for nb ≤ 15 and ≤ 32
    * allocated subbands at 224 kbps / 32 kHz).
    */
  def encodeMono(frames: Seq[Mp1Frame], bitrateIdx: Int = 7,
      fsIdx: Int = 2): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && fsIdx >= 0 && fsIdx <= 2)
    val frameBytes =
      (12 * BitrateKbps(bitrateIdx) * 1000 / SampleRate(fsIdx)) * 4
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { fr =>
      require(fr.alloc.length == 32 && fr.scf.length == 32 &&
        fr.codes.length == 32)
      val buf = new Array[Byte](frameBytes)
      var bitAt = 0
      def put(v: Int, nbits: Int): Unit = {
        var k = nbits - 1
        while (k >= 0) {
          if (((v >> k) & 1) == 1)
            buf(bitAt >> 3) = (buf(bitAt >> 3) | (0x80 >> (bitAt & 7))).toByte
          bitAt += 1
          k -= 1
        }
      }
      put(0xfff, 12) // sync
      put(1, 1) // ID: MPEG-1
      put(3, 2) // layer I = '11'
      put(0, 1) // protection_bit 0 = CRC present
      put(bitrateIdx, 4)
      put(fsIdx, 2)
      put(0, 1) // padding
      put(0, 1) // private
      put(3, 2) // mode: single_channel
      put(0, 2); put(0, 1); put(0, 1); put(0, 2) // mode_ext/copy/orig/emph
      // CRC over last 16 header bits + the 128 allocation bits
      var crc = 0xffff
      var b = 16
      while (b < 32) {
        crc = crcBit(crc, (buf(b >> 3) >> (7 - (b & 7))) & 1)
        b += 1
      }
      var sb = 0
      while (sb < 32) {
        val a = fr.alloc(sb)
        require(a == 0 || (a >= 2 && a <= 15), s"alloc $a")
        val field = if (a == 0) 0 else a - 1
        var k = 3
        while (k >= 0) { crc = crcBit(crc, (field >> k) & 1); k -= 1 }
        sb += 1
      }
      put(crc, 16)
      sb = 0
      while (sb < 32) {
        put(if (fr.alloc(sb) == 0) 0 else fr.alloc(sb) - 1, 4)
        sb += 1
      }
      sb = 0
      while (sb < 32) {
        if (fr.alloc(sb) > 0) {
          require(fr.scf(sb) >= 0 && fr.scf(sb) <= 62)
          put(fr.scf(sb), 6)
        }
        sb += 1
      }
      var q = 0
      while (q < 12) {
        sb = 0
        while (sb < 32) {
          val nb = fr.alloc(sb)
          if (nb > 0) {
            val c = fr.codes(sb)(q)
            require(c >= 0 && c < (1 << nb), s"code $c nb $nb")
            put(c, nb)
          }
          sb += 1
        }
        q += 1
      }
      require(bitAt <= frameBytes * 8, "payload exceeds frame size")
      out.write(buf, 0, frameBytes)
    }
    out.toByteArray
  }

  // --------------------------------------------------------------------
  // decode
  // --------------------------------------------------------------------

  def decode(docId: Long, bytes: Array[Byte]): Mp1Features = {
    val n = bytes.length
    if (n < 4) return sentinel(docId, n)
    var at = 0 // byte offset of the current frame
    var nFrames = 0L; var kbpsSum = 0L; var nAlloc = 0L
    var scfSum = 0L; var codeSum = 0L; var wSum = 0L
    while (at < n) {
      if (at + 4 > n) return sentinel(docId, n)
      @inline def bit(i: Int): Int =
        (bytes(at + (i >> 3)) >> (7 - (i & 7))) & 1
      @inline def bits(i: Int, w: Int): Int = {
        var v = 0; var k = 0
        while (k < w) { v = (v << 1) | bit(i + k); k += 1 }
        v
      }
      if (bits(0, 12) != 0xfff) return sentinel(docId, n)
      if (bit(12) != 1) return sentinel(docId, n) // MPEG-2 refused
      if (bits(13, 2) != 3) return sentinel(docId, n) // not Layer I
      val protection = bit(15)
      val brIdx = bits(16, 4)
      val fsIdx = bits(20, 2)
      val padding = bit(22)
      val mode = bits(24, 2)
      if (brIdx < 1 || brIdx > 14 || fsIdx > 2) return sentinel(docId, n)
      if (mode != 3) return sentinel(docId, n) // single_channel only
      val frameBytes =
        (12 * BitrateKbps(brIdx) * 1000 / SampleRate(fsIdx) + padding) * 4
      if (frameBytes < 4 || at + frameBytes > n) return sentinel(docId, n)
      var bitAt = 32
      val limit = frameBytes * 8
      @inline def take(w: Int): Int = {
        val v = bits(bitAt, w); bitAt += w; v
      }
      var crcStored = -1
      if (protection == 0) {
        if (bitAt + 16 > limit) return sentinel(docId, n)
        crcStored = take(16)
      }
      if (bitAt + 128 > limit) return sentinel(docId, n)
      val alloc = new Array[Int](32)
      var crc = 0xffff
      var b = 16
      while (b < 32) { crc = crcBit(crc, bit(b)); b += 1 }
      var sb = 0
      while (sb < 32) {
        val a = take(4)
        if (a == 15) return sentinel(docId, n) // forbidden
        var k = 3
        while (k >= 0) { crc = crcBit(crc, (a >> k) & 1); k -= 1 }
        alloc(sb) = if (a == 0) 0 else a + 1
        sb += 1
      }
      if (protection == 0 && crc != crcStored) return sentinel(docId, n)
      sb = 0
      while (sb < 32) {
        if (alloc(sb) > 0) {
          if (bitAt + 6 > limit) return sentinel(docId, n)
          val s = take(6)
          if (s == 63) return sentinel(docId, n) // forbidden
          scfSum += s
          nAlloc += 1
        }
        sb += 1
      }
      var q = 0
      while (q < 12) {
        sb = 0
        while (sb < 32) {
          val nb = alloc(sb)
          if (nb > 0) {
            if (bitAt + nb > limit) return sentinel(docId, n)
            val c = take(nb)
            codeSum += c
            wSum += c.toLong * (nFrames * 384L + q * 32L + sb + 1L)
          }
          sb += 1
        }
        q += 1
      }
      // remaining bits to the frame boundary are ancillary (zero-padded
      // by our encoder, ignored per spec)
      kbpsSum += BitrateKbps(brIdx)
      nFrames += 1
      at += frameBytes
    }
    if (nFrames == 0) sentinel(docId, n)
    else Mp1Features(docId, n.toLong, nFrames, kbpsSum, nAlloc, scfSum,
      codeSum, wSum)
  }

  /** (doc_id, payload BINARY) → feature rows; the typed-boundary
    * discipline of every codec (PLANS §15).
    */
  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[Mp1Features] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decode(id, b) })
  }
}
