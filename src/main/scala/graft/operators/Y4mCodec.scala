package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** A REAL video container decoder — YUV4MPEG2 (y4m) is the
  * uncompressed video interchange format (ffmpeg/mjpegtools), so
  * frame iteration and luma-plane math are pure byte arithmetic and
  * run for real here, completing the uncompressed triple
  * ([[PpmMediaCodec]] image, [[WavCodec]] audio). The genuine
  * grammar: a `YUV4MPEG2` stream-header line of space-separated
  * tagged params (`W<w> H<h> F<num>:<den> [Ia] [A..] [C<space>]`,
  * newline-terminated, unknown tags skipped), then per frame a
  * `FRAME[ params]\n` marker followed by the raw planes — Y (w·h)
  * plus U and V sized by the colorspace tag (C420 family quarter,
  * C422 half, C444 full, Cmono none). Unknown colorspaces,
  * truncated planes, or a missing marker yield the sentinel row
  * (`n_frames = -1`), never an exception.
  *
  * [[frameSample]] is m03's frame-sampling made real: every
  * `stride`-th frame of the DECODED container emits its luma-plane
  * stats (sum/min/max) — the per-frame feature a video curation
  * pipeline blocks and dedups on. The U/V planes are parsed for
  * SIZE (skipping them correctly is what container decoding means)
  * but not read into features.
  */
object Y4mCodec {

  /** Per-sampled-frame luma stats with the stream meta denormalized;
    * `n_frames = -1` (single row) is the malformed sentinel.
    */
  final case class FrameFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      frame_idx: Long,
      y_sum: Long,
      y_min: Long,
      y_max: Long)

  private def sentinel(docId: Long) =
    Seq(FrameFeatures(docId, 0L, 0L, -1L, -1L, 0L, 0L, 0L))

  def frameSample(docId: Long, bytes: Array[Byte],
      stride: Int): Seq[FrameFeatures] = {
    require(stride >= 1)
    val n = bytes.length
    var eol = 0
    while (eol < n && bytes(eol) != '\n') eol += 1
    if (eol >= n) return sentinel(docId)
    val header = new String(bytes, 0, eol, "US-ASCII").split(" ")
    if (header.isEmpty || header(0) != "YUV4MPEG2") return sentinel(docId)
    var w = -1
    var h = -1
    var chroma = "420"
    header.iterator.drop(1).filter(_.nonEmpty).foreach { tok =>
      tok.charAt(0) match {
        case 'W' => w = tok.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = tok.drop(1).toIntOption.getOrElse(-1)
        case 'C' => chroma = tok.drop(1)
        case _ => () // F/I/A/X params don't affect plane sizes
      }
    }
    if (w < 1 || h < 1) return sentinel(docId)
    // plane sizes in Long: W46341 H46341 overflows Int (w*h > 2^31),
    // which would make frameBytes negative and walk `i` backwards
    val ySizeL = w.toLong * h
    val uvSizeL = chroma match {
      case c if c.startsWith("420") => (w / 2).toLong * (h / 2)
      case c if c.startsWith("422") => (w / 2).toLong * h
      case c if c.startsWith("444") => w.toLong * h
      case "mono" => 0L
      case _ => return sentinel(docId)
    }
    val frameBytesL = ySizeL + 2L * uvSizeL
    // a frame larger than the whole payload can never decode; this also
    // guarantees the Int casts below are exact (n is an Int)
    if (frameBytesL > n) return sentinel(docId)
    val ySize = ySizeL.toInt
    val frameBytes = frameBytesL.toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[FrameFeatures]
    var i = eol + 1
    var idx = 0
    while (i < n) {
      // FRAME marker + optional params to end of line
      if (i + 5 > n || bytes(i) != 'F' || bytes(i + 1) != 'R' ||
          bytes(i + 2) != 'A' || bytes(i + 3) != 'M' || bytes(i + 4) != 'E')
        return sentinel(docId)
      i += 5
      while (i < n && bytes(i) != '\n') i += 1
      if (i >= n || i + 1 + frameBytes > n) return sentinel(docId)
      i += 1
      if (idx % stride == 0) {
        var sum = 0L
        var mn = 255L
        var mx = 0L
        var p = 0
        while (p < ySize) {
          val v = bytes(i + p) & 0xff
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          p += 1
        }
        out += FrameFeatures(docId, w.toLong, h.toLong, -2L, idx.toLong,
          sum, mn, mx)
      }
      i += frameBytes
      idx += 1
    }
    val total = idx.toLong
    out.map(_.copy(n_frames = total)).toSeq
  }

  /** Batched frame sampling over a (doc_id, payload) projection —
    * same mapPartitions boundary as the other codecs: the wide video
    * payload dies here, bounded per-frame rows flow on.
    */
  def extract(spark: SparkSession, binary: DataFrame,
      stride: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        frameSample(id, b, stride)
      })
  }
}
