package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REAL compressed-video decode with zero external libraries: MJPEG
  * in an AVI container. AVI is the RIFF grammar ([[WavCodec]]'s
  * sibling): `RIFF<size>AVI ` holding LIST chunks — `hdrl` with the
  * main header (`avih`: frame count, dimensions) and `movi` with the
  * per-frame data chunks (`00dc`/`00db`), each of which in MJPEG is
  * a COMPLETE baseline JPEG — decoded here through the JDK's own
  * ImageIO ([[JpegMediaCodec]]). Container walk + entropy-coded
  * frame decode, both real: after this the only video format behind
  * [[StubMediaCodec]] is inter-frame prediction (H.264/VP9-class),
  * which genuinely has no JDK decoder.
  *
  * [[frameSample]] mirrors [[Y4mCodec.frameSample]] — every
  * `stride`-th DECODED frame emits its luma stats (sum/min/max), the
  * per-frame feature a video curation pipeline blocks on — so the
  * uncompressed (y4m) and compressed (MJPEG) paths produce the same
  * schema. Oracle split (JPEG is lossy): frame count and dimensions
  * are closed-form (m18's oracle); luma values are spec-pinned
  * (determinism + encode→decode plausibility, as m15/m17).
  *
  * Malformed containers (bad fourcc, truncated chunks, frames that
  * fail JPEG decode) yield the sentinel (`n_frames = -1`), never an
  * exception.
  */
object AviCodec {

  @inline private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  @inline private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private def sentinel(docId: Long) =
    Seq(Y4mCodec.FrameFeatures(docId, 0L, 0L, -1L, -1L, 0L, 0L, 0L))

  /** Stride-sampled per-frame luma features over the decoded MJPEG
    * stream (same schema as [[Y4mCodec.frameSample]]).
    */
  def frameSample(docId: Long, bytes: Array[Byte],
      stride: Int): Seq[Y4mCodec.FrameFeatures] = {
    require(stride >= 1)
    val n = bytes.length
    if (n < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return sentinel(docId)
    // locate LIST movi by the top-level chunk walk
    var i = 12
    var moviOff = -1
    var moviEnd = -1
    while (i + 8 <= n && moviOff < 0) {
      val id = fourcc(bytes, i)
      val size = le32(bytes, i + 4)
      val body = i + 8
      if (body + size > n) return sentinel(docId)
      if (id == "LIST" && size >= 4 && fourcc(bytes, body) == "movi") {
        moviOff = body + 4
        moviEnd = (body + size).toInt
      }
      i = body + size.toInt + (size.toInt & 1)
    }
    if (moviOff < 0) return sentinel(docId)
    val out =
      scala.collection.mutable.ArrayBuffer.empty[Y4mCodec.FrameFeatures]
    var j = moviOff
    var idx = 0
    var w = -1L
    var h = -1L
    while (j + 8 <= moviEnd) {
      val id = fourcc(bytes, j)
      val size = le32(bytes, j + 4).toInt
      val body = j + 8
      if (body + size > moviEnd) return sentinel(docId)
      if (id.endsWith("dc") || id.endsWith("db")) {
        if (idx % stride == 0) {
          val jpg = java.util.Arrays.copyOfRange(bytes, body, body + size)
          JpegMediaCodec.readImage(jpg) match {
            case None => return sentinel(docId) // corrupt frame
            case Some(img) =>
              if (w < 0) { w = img.getWidth.toLong; h = img.getHeight }
              val argb = img.getRGB(0, 0, img.getWidth, img.getHeight,
                null, 0, img.getWidth)
              var sum = 0L
              var mn = 255L
              var mx = 0L
              var p = 0
              while (p < argb.length) {
                val v = argb(p)
                val l = (((v >> 16) & 0xff) + ((v >> 8) & 0xff) +
                  (v & 0xff)) / 3
                sum += l
                if (l < mn) mn = l
                if (l > mx) mx = l
                p += 1
              }
              out += Y4mCodec.FrameFeatures(docId, w, h, -2L,
                idx.toLong, sum, mn, mx)
          }
        }
        idx += 1
      }
      j = body + size + (size & 1)
    }
    if (idx == 0) return sentinel(docId)
    val total = idx.toLong
    out.map(_.copy(n_frames = total)).toSeq
  }

  /** Real minimal AVI/MJPEG writer for the generators: RIFF →
    * LIST hdrl (avih + LIST strl(strh, strf/BITMAPINFOHEADER)) →
    * LIST movi with one `00dc` JPEG per frame. The structural
    * headers carry real dimensions/frame counts so any AVI reader
    * agrees with [[frameSample]].
    */
  def aviMjpeg(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = { var i = 0; while (i < 4) {
      bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(id.getBytes("US-ASCII"))
      var i = 0
      while (i < 4) { o.write((body.length >> (8 * i)) & 0xff); i += 1 }
      o.write(body)
      if ((body.length & 1) == 1) o.write(0)
      o.toByteArray
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    def le(v: Long, len: Int): Array[Byte] =
      Array.tabulate(len)(i => ((v >> (8 * i)) & 0xff).toByte)
    val avih = le(33333L, 4) ++ le(0L, 4) ++ le(0L, 4) ++ le(0x10L, 4) ++
      le(frames.size.toLong, 4) ++ le(0L, 4) ++ le(1L, 4) ++ le(0L, 4) ++
      le(w.toLong, 4) ++ le(h.toLong, 4) ++ le(0L, 16)
    val strh = "vids".getBytes("US-ASCII") ++
      "MJPG".getBytes("US-ASCII") ++ le(0L, 12) ++ le(1L, 4) ++
      le(30L, 4) ++ le(0L, 4) ++ le(frames.size.toLong, 4) ++
      le(0L, 4) ++ le(0L, 4) ++ le(0L, 4) ++ le(0L, 8)
    val strf = le(40L, 4) ++ le(w.toLong, 4) ++ le(h.toLong, 4) ++
      le(1L, 2) ++ le(24L, 2) ++ "MJPG".getBytes("US-ASCII") ++
      le(w.toLong * h * 3, 4) ++ le(0L, 16)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val payload = hdrl ++ movi
    cc("RIFF"); w32(4L + payload.length); cc("AVI ")
    bos.write(payload)
    bos.toByteArray
  }

  /** Batched frame sampling over a (doc_id, payload) projection —
    * the same mapPartitions boundary as [[Y4mCodec.extract]].
    */
  def extract(spark: SparkSession, binary: DataFrame,
      stride: Int): Dataset[Y4mCodec.FrameFeatures] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        frameSample(id, b, stride)
      })
  }
}
