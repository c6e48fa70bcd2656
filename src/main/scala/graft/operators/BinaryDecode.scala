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
  * The byte-level kernels live behind the [[MediaCodec]] trait;
  * every operator here takes the codec as a parameter defaulting to
  * [[StubMediaCodec]] (this container ships no codec libraries). A
  * production deployment passes its real codec and NOTHING else
  * changes — schemas, pruning, batching, and downstream plans are
  * codec-independent.
  *
  * Scale notes (100 TB): the input projection selects only (id, bytes)
  * so the parquet scan prunes all other columns; decode parallelism =
  * partition count; decoded features are small fixed-width rows, so
  * the expensive wide binary column dies at this boundary instead of
  * flowing through downstream joins.
  */
object BinaryDecode {

  /** Features a decoder emits (see [[MediaCodec.decode]]). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      byte_sum: Long, // stub for e.g. mean luminance
      h0: Long, // stub 4-bin "histogram": count of bytes in [0,32)
      h1: Long, // [32,64)
      h2: Long, // [64,96)
      h3: Long // [96,128+) — ASCII payloads never exceed 127
  )

  /** The stub decode kernel — kept as a named entry point because the
    * oracle SQL mirrors it term-for-term; delegates to
    * [[StubMediaCodec]].
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaFeatures =
    StubMediaCodec.decode(docId, bytes)

  /** Batched decode over a (id, payload) projection. */
  def extractFeatures(spark: SparkSession, binary: DataFrame,
      codec: MediaCodec = StubMediaCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (one codec instance)
        rows.map { case (id, bytes) => codec.decode(id, bytes) }
      }
  }

  /** A resized payload: bytes → bytes with the original size kept as
    * metadata (a real resize would also carry width/height).
    */
  final case class Resized(doc_id: Long, n_in: Long, payload: Array[Byte])

  /** The stub resample kernel (oracle-mirrored); delegates to
    * [[StubMediaCodec]].
    */
  def resizeStub(bytes: Array[Byte], target: Int): Array[Byte] =
    StubMediaCodec.resize(bytes, target)

  /** Batched resize over a (id, payload) projection — same partition
    * shape as [[extractFeatures]]: the wide input binary dies at this
    * boundary; only the bounded output payload flows on.
    */
  def resize(spark: SparkSession, binary: DataFrame, target: Int,
      codec: MediaCodec = StubMediaCodec): Dataset[Resized] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          Resized(id, bytes.length.toLong, codec.resize(bytes, target))
        }
      }
  }

  /** Perceptual average-hash row: the media fingerprint a dedup index
    * serves from (`n_samples` ≤ grid; `ahash` uses bits `0..n-1`).
    */
  final case class PerceptualHash(doc_id: Long, n_samples: Long,
      ahash: Long)

  /** The stub aHash kernel (oracle-mirrored); delegates to
    * [[StubMediaCodec]].
    */
  def aHashStub(docId: Long, bytes: Array[Byte],
      grid: Int): PerceptualHash =
    StubMediaCodec.perceptualHash(docId, bytes, grid)

  /** Batched perceptual hashing over a (id, payload) projection —
    * the fingerprint index build of a LAION-style media dedup: the
    * wide binary dies here, 12 bytes/row flow on. The `grid ≤ 63`
    * bound is the ENGINE's contract (the hash must fit non-negative
    * BIGINT for the oracle), not the codec's.
    */
  def perceptualHashes(spark: SparkSession, binary: DataFrame,
      grid: Int = 32,
      codec: MediaCodec = StubMediaCodec): Dataset[PerceptualHash] = {
    import spark.implicits._
    require(grid >= 1 && grid <= 63, s"grid must be in [1, 63], got $grid")
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        codec.perceptualHash(id, bytes, grid)
      })
  }
}
