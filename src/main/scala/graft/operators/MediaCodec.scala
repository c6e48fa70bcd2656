package graft.operators

import graft.operators.BinaryDecode.{MediaFeatures, PerceptualHash}

/** THE codec boundary of the multimodal pack: every media kernel the
  * m-pack runs — decode/feature-extract, resample, perceptual hash —
  * sits behind this one trait, so a production deployment swaps in a
  * real codec (JNI ffmpeg/libjpeg, a JVM imaging library, …) by
  * providing one implementation, without touching any plan: the
  * Spark-side shape (column pruning to (id, payload), partition
  * batching, fixed-width output schemas, downstream joins) is
  * codec-independent by construction.
  *
  * Contract:
  *   - implementations must be [[Serializable]] (they ship to
  *     executors inside the `mapPartitions` closures) and
  *     deterministic per input bytes — the m-pack's dedup/blocking
  *     queries assume hash-stable features;
  *   - `decode` is total: malformed payloads must yield a row (a real
  *     codec maps decode failure to a sentinel/flag feature row, not
  *     an exception — one poison byte string must not kill a 100 TB
  *     job);
  *   - per-partition setup (opening one decoder instance, NOT one per
  *     row) belongs in the `mapPartitions` iterator construction in
  *     [[BinaryDecode]], which is why these are per-row kernels: the
  *     batching is the engine's job, the byte math is the codec's.
  */
trait MediaCodec extends Serializable {

  /** bytes → fixed-width features (a real build: decoded image stats,
    * embedding, EXIF-derived fields).
    */
  def decode(docId: Long, bytes: Array[Byte]): MediaFeatures

  /** bytes → smaller bytes (a real build: pixel resample); metadata
    * stays the engine's concern.
    */
  def resize(bytes: Array[Byte], target: Int): Array[Byte]

  /** bytes → ≤63-bit perceptual fingerprint over a `grid`-cell
    * downsample (a real build: aHash/pHash over pixels).
    */
  def perceptualHash(docId: Long, bytes: Array[Byte],
      grid: Int): PerceptualHash
}

/** The environment-bound deterministic STUB codec. After PPM/PGM
  * ([[PpmMediaCodec]]), PNG ([[PngMediaCodec]]), GIF with real LZW
  * ([[GifMediaCodec]]), PCM/μ-law/ADPCM audio ([[WavCodec]]), y4m
  * video ([[Y4mCodec]]), JPEG via the JDK's own ImageIO
  * ([[JpegMediaCodec]]) and MJPEG-in-AVI video ([[AviCodec]]), the
  * only formats still behind this stub are
  * PERCEPTUAL audio (MP3/AAC) and INTER-FRAME video (H.264/VP9) —
  * the JDK genuinely ships no decoder for those. (The boundary keeps
  * shrinking: [[Mp1Codec]] decodes MPEG-1 Layer I subbands for real,
  * [[JpegScratch]] decodes baseline-JPEG Huffman from scratch, and
  * [[H264Sps]] decodes H.264 SPS geometry — real Exp-Golomb — so
  * what genuinely remains stubbed is slice RECONSTRUCTION and
  * psychoacoustic synthesis, the parts that need a codec library.) The kernels are
  * byte-statistics stand-ins (honest fakes, same shapes): decode
  * emits
  * byte-sum/histogram rows, resize stride-downsamples, the
  * perceptual hash is the classic aHash computed over stride samples
  * instead of pixels. All pure integer math, reproduced bit-for-bit
  * by the DuckDB oracle (m01–m07). Everything stub-specific lives in
  * THIS object; swapping it out touches no other file.
  */
object StubMediaCodec extends MediaCodec {

  override def decode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      hist(math.min(b >> 5, 3L).toInt) += 1
      i += 1
    }
    MediaFeatures(docId, bytes.length.toLong, sum, hist(0), hist(1),
      hist(2), hist(3))
  }

  /** Stride-downsample to ≤ `target` bytes (every `max(1, n/target)`-th
    * byte, capped at `target` samples).
    */
  override def resize(bytes: Array[Byte], target: Int): Array[Byte] = {
    val n = bytes.length
    val stride = math.max(1, n / target)
    val count = math.min(target, (n - 1) / stride + 1)
    val out = new Array[Byte](math.max(count, 0))
    var j = 0
    while (j < count) { out(j) = bytes(j * stride); j += 1 }
    out
  }

  /** aHash over stride samples: bit i = 1 iff sample_i is strictly
    * above the sample mean, compared as the integer cross-
    * multiplication `s_i · n > sum` — no division, engine-portable.
    */
  override def perceptualHash(docId: Long, bytes: Array[Byte],
      grid: Int): PerceptualHash = {
    val s = resize(bytes, grid)
    val n = s.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (s(i) & 0xff); i += 1 }
    var h = 0L
    i = 0
    while (i < n) {
      if ((s(i) & 0xff).toLong * n > sum) h |= (1L << i)
      i += 1
    }
    PerceptualHash(docId, n.toLong, h)
  }
}
