package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal binary-column processing plumbing.
  *
  * Media payloads (image/audio/video) are opaque `BINARY` columns with
  * typed metadata alongside. The decode / feature-extract step runs as
  * a typed `mapPartitions` over the binary column — the Scala analog
  * of PySpark's `mapInPandas` batched decode UDF (same iterator-of-
  * batches contract, same schema-in/schema-out signature): rows stream
  * through the partition iterator without materializing the whole
  * partition, and any per-partition setup (a real codec would open one
  * decoder per partition, not per row) happens once at iterator
  * construction.
  *
  * STUB: the environment has no image/audio codecs, so [[decodeStub]]
  * is a deterministic fake — byte statistics standing in for decoded
  * features. The Spark-side shape (schema, encoders, partition
  * batching, column pruning before the decode) is real and tested; a
  * production build swaps `decodeStub`'s body for the codec call.
  *
  * Scale notes (100 TB): the input projection selects only (id, bytes)
  * so the parquet scan prunes all other columns; decode parallelism =
  * partition count; decoded features are small fixed-width rows, so
  * the expensive wide binary column dies at this boundary instead of
  * flowing through downstream joins.
  */
object BinaryDecode {

  /** Features a decoder would emit (deterministic stub values). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      byte_sum: Long, // stub for e.g. mean luminance
      h0: Long, // stub 4-bin "histogram": count of bytes in [0,32)
      h1: Long, // [32,64)
      h2: Long, // [64,96)
      h3: Long // [96,128+) — ASCII payloads never exceed 127
  )

  /** The stubbed decode: bytes → features. Deterministic, total. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaFeatures = {
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

  /** Batched decode over a (id, payload) projection. */
  def extractFeatures(spark: SparkSession, binary: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (one codec instance)
        rows.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** A resized payload: bytes → bytes with the original size kept as
    * metadata (a real resize would also carry width/height).
    */
  final case class Resized(doc_id: Long, n_in: Long, payload: Array[Byte])

  /** Stubbed resize: stride-downsample to ≤ `target` bytes (every
    * `max(1, n/target)`-th byte, capped at `target` samples) — the
    * deterministic stand-in for an image resample: bytes → smaller
    * bytes, metadata updated, payload stays opaque BINARY.
    */
  def resizeStub(bytes: Array[Byte], target: Int): Array[Byte] = {
    val n = bytes.length
    val stride = math.max(1, n / target)
    val count = math.min(target, (n - 1) / stride + 1)
    val out = new Array[Byte](math.max(count, 0))
    var j = 0
    while (j < count) { out(j) = bytes(j * stride); j += 1 }
    out
  }

  /** Batched resize over a (id, payload) projection — same partition
    * shape as [[extractFeatures]]: the wide input binary dies at this
    * boundary; only the bounded output payload flows on.
    */
  def resize(spark: SparkSession, binary: DataFrame,
      target: Int): Dataset[Resized] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          Resized(id, bytes.length.toLong, resizeStub(bytes, target))
        }
      }
  }

  /** Perceptual average-hash row: the media fingerprint a dedup index
    * serves from (`n_samples` ≤ grid; `ahash` uses bits `0..n-1`).
    */
  final case class PerceptualHash(doc_id: Long, n_samples: Long,
      ahash: Long)

  /** Stubbed aHash (the classic average-hash of image dedup): stride-
    * sample the payload to ≤ `grid` values ([[resizeStub]] — a real
    * build downsamples pixels to the grid), then bit i = 1 iff
    * sample_i is strictly above the sample mean. The compare is the
    * integer cross-multiplication `s_i · n > sum` — no division, so
    * the bit pattern is reproducible exactly in any engine. `grid`
    * must be ≤ 63 so the hash stays in non-negative BIGINT range.
    */
  def aHashStub(docId: Long, bytes: Array[Byte],
      grid: Int): PerceptualHash = {
    val s = resizeStub(bytes, grid)
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

  /** Batched perceptual hashing over a (id, payload) projection —
    * the fingerprint index build of a LAION-style media dedup: the
    * wide binary dies here, 12 bytes/row flow on.
    */
  def perceptualHashes(spark: SparkSession, binary: DataFrame,
      grid: Int = 32): Dataset[PerceptualHash] = {
    import spark.implicits._
    require(grid >= 1 && grid <= 63, s"grid must be in [1, 63], got $grid")
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        aHashStub(id, bytes, grid)
      })
  }
}
