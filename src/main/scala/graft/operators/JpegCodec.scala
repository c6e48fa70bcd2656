package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import graft.operators.BinaryDecode.{MediaFeatures, PerceptualHash}

/** REAL entropy-coded image decode with zero external libraries: the
  * JDK's own `javax.imageio` (java.desktop module) ships a baseline
  * JPEG decoder/encoder in every JDK, headless included. This retires
  * the "entropy-coded formats are environment-bound" claim for
  * IMAGES — after PPM/PGM (raw), PNG (DEFLATE), WAV and Y4M, the
  * remaining [[StubMediaCodec]] surface is audio/video entropy
  * formats (MP3/H.264) only, which genuinely have no JDK decoder.
  *
  * Oracle discipline (JPEG is LOSSY, so decoded pixels are not
  * closed-form): the declared query (m15) emits only the EXACT
  * surface — dimensions, band count, payload size, decode success —
  * which the generator fixes closed-form; pixel-feature determinism
  * and plausibility (a decode→encode→decode fixed point, luma mass
  * of near-uniform images) are spec-pinned in JpegCodecSpec instead.
  *
  * Totality: ImageIO sniffs the stream and returns null (or throws
  * IIOException on truncated entropy data) for anything unreadable —
  * both map to the sentinel row, never an exception, and a leading
  * SOI-marker check short-circuits the sniff for the overwhelmingly
  * common "not a JPEG at all" case without consuming a reader.
  */
object JpegMediaCodec extends MediaCodec {

  // decode must work on a display-less executor; harmless if AWT was
  // already initialized headless (the property is read once)
  try System.setProperty("java.awt.headless", "true")
  catch { case _: SecurityException => () }

  /** Exact (non-lossy) decode surface of one payload. `ok = 0` with
    * zeroed dims is the malformed sentinel.
    */
  final case class JpegMeta(
      doc_id: Long,
      n_bytes: Long,
      ok: Long,
      width: Long,
      height: Long,
      n_bands: Long)

  private[operators] def readImage(
      bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes.length < 4 || bytes(0) != 0xff.toByte ||
        bytes(1) != 0xd8.toByte) None // not SOI-framed
    else
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch {
        case _: java.io.IOException => None
        case _: RuntimeException => None // corrupt entropy segments
      }

  def meta(docId: Long, bytes: Array[Byte]): JpegMeta =
    readImage(bytes) match {
      case None => JpegMeta(docId, bytes.length.toLong, 0L, 0L, 0L, 0L)
      case Some(img) => JpegMeta(docId, bytes.length.toLong, 1L,
        img.getWidth.toLong, img.getHeight.toLong,
        img.getRaster.getNumBands.toLong)
    }

  /** Decoded luma plane (0–255, (r+g+b)/3 — the same truncating
    * average as [[PngMediaCodec]] so features are comparable across
    * codecs) in row-major order.
    */
  private def lumaPlane(img: BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      val p = argb(i)
      out(i) = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
      i += 1
    }
    out
  }

  override def decode(docId: Long, bytes: Array[Byte]): MediaFeatures =
    readImage(bytes) match {
      case None =>
        MediaFeatures(docId, bytes.length.toLong, -1L, 0L, 0L, 0L, 0L)
      case Some(img) =>
        val luma = lumaPlane(img)
        var sum = 0L
        val hist = new Array[Long](4)
        var i = 0
        while (i < luma.length) {
          sum += luma(i)
          hist(luma(i) >> 6) += 1
          i += 1
        }
        MediaFeatures(docId, bytes.length.toLong, sum, hist(0), hist(1),
          hist(2), hist(3))
    }

  /** Nearest-neighbor resample to `target`×`target`, re-encoded as a
    * real JPEG (the codec's own encoder, default quality).
    */
  override def resize(bytes: Array[Byte], target: Int): Array[Byte] =
    readImage(bytes) match {
      case None => Array.emptyByteArray
      case Some(img) =>
        val t = math.max(1, target)
        val out = new BufferedImage(t, t, BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < t) {
          var x = 0
          while (x < t) {
            out.setRGB(x, y, img.getRGB(
              (x.toLong * img.getWidth / t).toInt,
              (y.toLong * img.getHeight / t).toInt))
            x += 1
          }
          y += 1
        }
        writeJpeg(out)
    }

  /** aHash over the decoded luma, sampled exactly like
    * [[PngMediaCodec.perceptualHash]] (same bit layout, so banded
    * near-dup blocking can mix codecs).
    */
  override def perceptualHash(docId: Long, bytes: Array[Byte],
      grid: Int): PerceptualHash =
    readImage(bytes) match {
      case None => PerceptualHash(docId, 0L, 0L)
      case Some(img) =>
        val luma = lumaPlane(img)
        val total = luma.length
        val n = math.min(grid, total)
        var sum = 0L
        val s = new Array[Int](n)
        var i = 0
        while (i < n) {
          s(i) = luma((i.toLong * total / n).toInt)
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

  /** Real JPEG encoder (ImageIO, default quality) for the query
    * generators and [[resize]]: 8-bit RGB row-major in, SOI-framed
    * baseline JPEG out.
    */
  def encodeRgb8(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var p = 0
    while (p < w * h) {
      val j = p * 3
      img.setRGB(p % w, p / w,
        ((rgb(j) & 0xff) << 16) | ((rgb(j + 1) & 0xff) << 8) |
          (rgb(j + 2) & 0xff))
      p += 1
    }
    writeJpeg(img)
  }

  private def writeJpeg(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }
}
