package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** From-scratch baseline JPEG (ITU T.81) — the entropy layer decoded
  * with zero libraries. Huffman coding is the fourth from-scratch
  * entropy codec in the engine (after DEFLATE-in-PNG, GIF's LZW and
  * FLAC's Rice), and it is THE one that powers the classic lossy
  * formats: this file implements the real JPEG Huffman machinery —
  * canonical code construction from DHT bit-counts (the spec's
  * generate_size/code_table procedures), the DECODE procedure with
  * mincode/maxcode/valptr, EXTEND's one's-complement negatives, DC
  * prediction, AC run/size with ZRL and EOB, 0xFF byte
  * stuffing/unstuffing, restart markers, and the full marker walk
  * (SOI/APP/COM/DQT/DHT/SOF0/DRI/SOS/EOI).
  *
  * The decode target is the COEFFICIENT layer: dequantized DCT
  * coefficients are exact integers (PLANS §84 — the integer payload
  * layer is where parsing hazards and features live), so the census
  * is oracle-checkable closed-form. The float IDCT half is m15's
  * ImageIO territory and stays out of this file by design.
  *
  * Realness is proven in BOTH directions ([[graft.JpegScratchSpec]]):
  * the from-scratch encoder's bitstream is decoded by the JDK's own
  * ImageIO (pixel-exact for DC-only blocks, where the IDCT is exact),
  * and the from-scratch decoder parses ImageIO's own grayscale
  * encoder output — foreign tables, foreign bitstream.
  *
  * Scope: baseline sequential, 8-bit, single-component (grayscale)
  * scans — the JFIF shape a curation pipeline's thumbnail/luma tier
  * emits. Progressive, 12-bit, multi-component and arithmetic-coded
  * streams land on the sentinel, as does anything malformed
  * (truncation, forbidden symbols, coefficient overrun, bad restart
  * sequence, trailing bytes).
  */
object JpegScratch {

  /** Coefficient-layer feature row; `n_blocks = -1` is the malformed
    * sentinel. `dc_sum` is over DEQUANTIZED, prediction-resolved DC
    * coefficients; `coeff_weighted` = Σ coeff·(block·64 + zigzag + 1)
    * over all coefficients — any mis-parse of the run/size stream or
    * the prediction chain breaks it.
    */
  final case class JpegCoeffFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_blocks: Long,
      dc_sum: Long,
      ac_nonzero: Long,
      coeff_weighted: Long)

  private def sentinel(docId: Long, n: Int) =
    JpegCoeffFeatures(docId, n.toLong, 0L, 0L, -1L, 0L, 0L, 0L)

  // ---- Annex K (T.81) luminance Huffman tables ----------------------
  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0) // lengths 1..16
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman codes per the spec's generate_size_table /
    * generate_code_table: symbols in DHT order get consecutive codes,
    * lengths ascending. Returns (code, size) indexed by symbol value.
    */
  private def encTable(bits: Array[Int],
      vals: Array[Int]): (Array[Int], Array[Int]) = {
    val codes = new Array[Int](256)
    val sizes = new Array[Int](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        codes(vals(k)) = code
        sizes(vals(k)) = len
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      len += 1
    }
    (codes, sizes)
  }

  /** Decoder tables per the spec's DECODE procedure. */
  private final class DecTable(bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1)
          k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  // --------------------------------------------------------------------
  // encode
  // --------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        buf = (buf << 1) | ((v >> k) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        k -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { // pad with 1-bits per spec
      buf = (buf << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
      out.write(buf & 0xff)
      if ((buf & 0xff) == 0xff) out.write(0x00)
      buf = 0; cnt = 0
    }
  }

  @inline private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Real baseline JFIF encoder over QUANTIZED coefficient blocks in
    * zigzag order (64 per block, raster block order), all-ones quant
    * table, Annex K luminance Huffman tables, single grayscale
    * component. `restartInterval > 0` emits DRI + RSTn markers.
    */
  def encodeCoeffs(w: Int, h: Int, blocks: Array[Array[Int]],
      restartInterval: Int = 0): Array[Byte] = {
    val nbx = (w + 7) / 8
    val nby = (h + 7) / 8
    require(blocks.length == nbx * nby && w >= 1 && h >= 1)
    require(blocks.forall(_.length == 64))
    val out = new java.io.ByteArrayOutputStream()
    def m(code: Int): Unit = { out.write(0xff); out.write(code) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xe0); u16(16) // APP0 / JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); u16(1); u16(1)
    out.write(0); out.write(0)
    m(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT: Pq=0, Tq=0
    var i = 0
    while (i < 64) { out.write(1); i += 1 } // all-ones table
    m(0xc0); u16(8 + 3) // SOF0
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xc4); u16(2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length))
    out.write(0x00); DcBits.foreach(out.write); DcVals.foreach(out.write)
    out.write(0x10); AcBits.foreach(out.write); AcVals.foreach(out.write)
    if (restartInterval > 0) { m(0xdd); u16(4); u16(restartInterval) }
    m(0xda); u16(6 + 2) // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val (dcCodes, dcSizes) = encTable(DcBits, DcVals)
    val (acCodes, acSizes) = encTable(AcBits, AcVals)
    var bw = new BitWriter(out)
    var pred = 0
    var rst = 0
    var b = 0
    while (b < blocks.length) {
      if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
        bw.flush()
        m(0xd0 + (rst & 7))
        rst += 1
        pred = 0
        bw = new BitWriter(out)
      }
      val blk = blocks(b)
      val diff = blk(0) - pred
      pred = blk(0)
      val s = category(diff)
      require(s <= 11, s"DC category $s")
      bw.put(dcCodes(s), dcSizes(s))
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = blk(k)
        if (v == 0) run += 1
        else {
          while (run > 15) {
            bw.put(acCodes(0xf0), acSizes(0xf0)) // ZRL
            run -= 16
          }
          val sz = category(v)
          require(sz <= 10, s"AC size $sz")
          val rs = (run << 4) | sz
          bw.put(acCodes(rs), acSizes(rs))
          bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCodes(0x00), acSizes(0x00)) // EOB
      b += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }

  /** Real grayscale pixel encoder: level shift, float FDCT (exact for
    * the DC-only blocks the interop proof uses), all-ones quant.
    */
  def encodeGray8(w: Int, h: Int, gray: Array[Byte],
      restartInterval: Int = 0): Array[Byte] = {
    require(gray.length == w * h && w % 8 == 0 && h % 8 == 0)
    val nbx = w / 8
    val blocks = Array.tabulate(nbx * (h / 8)) { b =>
      val bx = b % nbx; val by = b / nbx
      val s = Array.tabulate(8, 8)((y, x) =>
        (gray((by * 8 + y) * w + bx * 8 + x) & 0xff) - 128.0)
      val zz = new Array[Int](64)
      var zi = 0
      while (zi < 64) {
        val (u, v) = ZigzagUV(zi)
        var acc = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            acc += s(y)(x) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        zz(zi) = math.round(acc * cu * cv / 4.0).toInt
        zi += 1
      }
      zz
    }
    encodeCoeffs(w, h, blocks, restartInterval)
  }

  /** (horizontal u, vertical v) frequency pair per zigzag index. */
  private val ZigzagUV: Array[(Int, Int)] = {
    val order = new Array[(Int, Int)](64)
    var zi = 0
    for (s <- 0 until 15) {
      val range = if (s % 2 == 0) (s to 0 by -1) else (0 to s)
      for (v <- range; if v <= 7 && s - v <= 7) {
        order(zi) = (s - v, v)
        zi += 1
      }
    }
    order
  }

  // --------------------------------------------------------------------
  // decode
  // --------------------------------------------------------------------

  def decode(docId: Long, bytes: Array[Byte]): JpegCoeffFeatures = {
    val n = bytes.length
    if (n < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return sentinel(docId, n)
    var at = 2
    @inline def u8(): Int = { val v = bytes(at) & 0xff; at += 1; v }
    @inline def u16v(): Int = { val v = ((bytes(at) & 0xff) << 8) |
      (bytes(at + 1) & 0xff); at += 2; v }
    val quant = Array.ofDim[Int](4, 64)
    val qSeen = new Array[Boolean](4)
    val dcTabs = new Array[DecTable](4)
    val acTabs = new Array[DecTable](4)
    var w = -1; var h = -1
    var dcSel = -1; var acSel = -1; var qSel = -1
    var restartInterval = 0
    var sosAt = -1
    // ---- marker walk up to SOS ----------------------------------------
    while (sosAt < 0) {
      if (at + 2 > n) return sentinel(docId, n)
      if (u8() != 0xff) return sentinel(docId, n)
      var mk = u8()
      while (mk == 0xff && at < n) mk = u8() // fill bytes
      mk match {
        case 0xdb => // DQT (possibly several tables)
          if (at + 2 > n) return sentinel(docId, n)
          val end = { val len = u16v(); at + len - 2 }
          if (end > n) return sentinel(docId, n)
          while (at < end) {
            val pt = u8()
            if ((pt >> 4) != 0 || (pt & 15) > 3) return sentinel(docId, n)
            if (at + 64 > end) return sentinel(docId, n)
            var i = 0
            while (i < 64) { quant(pt & 15)(i) = u8(); i += 1 }
            qSeen(pt & 15) = true
          }
          if (at != end) return sentinel(docId, n)
        case 0xc4 => // DHT (possibly several tables)
          if (at + 2 > n) return sentinel(docId, n)
          val end = { val len = u16v(); at + len - 2 }
          if (end > n) return sentinel(docId, n)
          while (at < end) {
            val tc = u8()
            if ((tc >> 4) > 1 || (tc & 15) > 3) return sentinel(docId, n)
            if (at + 16 > end) return sentinel(docId, n)
            val bits = Array.fill(16)(u8())
            val total = bits.sum
            if (total > 256 || at + total > end) return sentinel(docId, n)
            val vals = Array.fill(total)(u8())
            val t = new DecTable(bits, vals)
            if ((tc >> 4) == 0) dcTabs(tc & 15) = t else acTabs(tc & 15) = t
          }
          if (at != end) return sentinel(docId, n)
        case 0xc0 => // SOF0 baseline
          if (at + 2 > n) return sentinel(docId, n)
          val end = { val len = u16v(); at + len - 2 }
          if (end > n) return sentinel(docId, n)
          if (u8() != 8) return sentinel(docId, n)
          h = u16v(); w = u16v()
          val ncomp = u8()
          if (ncomp != 1 || w < 1 || h < 1 ||
            w.toLong * h > (1L << 26)) return sentinel(docId, n)
          u8() // component id
          u8() // sampling factors (single-component scan: one block/MCU)
          qSel = u8()
          if (qSel > 3 || at != end) return sentinel(docId, n)
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          return sentinel(docId, n) // progressive/arithmetic/12-bit
        case 0xdd => // DRI
          if (at + 4 > n || u16v() != 4) return sentinel(docId, n)
          restartInterval = u16v()
        case 0xda => // SOS
          if (at + 2 > n) return sentinel(docId, n)
          val end = { val len = u16v(); at + len - 2 }
          if (end > n) return sentinel(docId, n)
          if (u8() != 1) return sentinel(docId, n) // single-component scan
          u8() // component selector
          val t = u8()
          dcSel = t >> 4; acSel = t & 15
          if (u8() != 0 || u8() != 63 || u8() != 0) // Ss/Se/AhAl baseline
            return sentinel(docId, n)
          if (at != end) return sentinel(docId, n)
          sosAt = at
        case x if x >= 0xe0 && x <= 0xef => // APPn
          if (at + 2 > n) return sentinel(docId, n)
          val len = u16v()
          if (len < 2 || at + len - 2 > n) return sentinel(docId, n)
          at += len - 2
        case 0xfe => // COM
          if (at + 2 > n) return sentinel(docId, n)
          val len = u16v()
          if (len < 2 || at + len - 2 > n) return sentinel(docId, n)
          at += len - 2
        case _ => return sentinel(docId, n)
      }
    }
    if (w < 0 || qSel < 0 || !qSeen(qSel) || dcSel < 0 ||
      dcTabs(dcSel) == null || acTabs(acSel) == null)
      return sentinel(docId, n)
    val q = quant(qSel)
    val dcT = dcTabs(dcSel)
    val acT = acTabs(acSel)
    // ---- entropy-coded segment ----------------------------------------
    var cur = 0
    var cnt = 0
    var bad = false
    @inline def readBit(): Int = {
      if (cnt == 0) {
        if (at >= n) { bad = true; return 0 }
        var b = bytes(at) & 0xff; at += 1
        if (b == 0xff) {
          val nx = if (at < n) bytes(at) & 0xff else -1
          if (nx == 0) at += 1 // stuffed data byte
          else { bad = true; return 0 } // marker inside entropy data
        }
        cur = b; cnt = 8
      }
      cnt -= 1
      (cur >> cnt) & 1
    }
    @inline def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    @inline def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    def huff(t: DecTable): Int = {
      var code = readBit()
      var len = 1
      while (len <= 16) {
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
          return t.vals(t.valPtr(len) + code - t.minCode(len))
        code = (code << 1) | readBit()
        len += 1
      }
      bad = true
      0
    }
    val nBlocks = ((w + 7) / 8) * ((h + 7) / 8)
    var pred = 0
    var rstExpect = 0
    var dcSum = 0L; var acNz = 0L; var wSum = 0L
    var b = 0
    while (b < nBlocks) {
      if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
        // byte-align, then the restart marker in sequence
        cnt = 0
        if (at + 2 > n || (bytes(at) & 0xff) != 0xff ||
          (bytes(at + 1) & 0xff) != (0xd0 + (rstExpect & 7)))
          return sentinel(docId, n)
        at += 2
        rstExpect += 1
        pred = 0
      }
      val s = huff(dcT)
      if (bad || s > 11) return sentinel(docId, n)
      val diff = extend(receive(s), s)
      pred += diff
      val dc = pred * q(0)
      dcSum += dc
      wSum += dc.toLong * (b * 64L + 1L)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = huff(acT)
        if (bad) return sentinel(docId, n)
        val r = rs >> 4
        val sz = rs & 15
        if (sz == 0) {
          if (r == 15) k += 16 // ZRL
          else done = true // EOB
        } else {
          k += r
          if (k > 63) return sentinel(docId, n)
          val v = extend(receive(sz), sz) * q(k)
          acNz += 1
          wSum += v.toLong * (b * 64L + k + 1L)
          k += 1
        }
      }
      if (bad) return sentinel(docId, n)
      b += 1
    }
    // byte-align and require EOI (optionally preceded by fill 0xFFs)
    cnt = 0
    if (at + 2 > n || (bytes(at) & 0xff) != 0xff) return sentinel(docId, n)
    while (at < n && (bytes(at) & 0xff) == 0xff &&
      at + 1 < n && (bytes(at + 1) & 0xff) == 0xff) at += 1
    if (at + 2 > n || (bytes(at) & 0xff) != 0xff ||
      (bytes(at + 1) & 0xff) != 0xd9) return sentinel(docId, n)
    if (at + 2 != n) return sentinel(docId, n) // trailing bytes
    JpegCoeffFeatures(docId, n.toLong, w.toLong, h.toLong,
      nBlocks.toLong, dcSum, acNz, wSum)
  }

  /** (doc_id, payload BINARY) → feature rows; the typed-boundary
    * discipline of every codec (PLANS §15).
    */
  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[JpegCoeffFeatures] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decode(id, b) })
  }
}
