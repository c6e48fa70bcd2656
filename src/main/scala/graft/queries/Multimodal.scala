package graft.queries

import graft.Tables
import graft.operators.BinaryDecode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY §2.3 north-star): media as
  * opaque BINARY columns + typed metadata. The corpus has no real
  * media, so `documents.text` cast to BINARY stands in for the payload
  * (ASCII bytes — which makes the byte-level oracle expressible in
  * DuckDB via `ascii()`); the decode step is the documented stub in
  * [[graft.operators.BinaryDecode]].
  *
  * m01 exercises binary metadata extraction (pure expressions —
  * codegen'd, pushdown-friendly); m02 exercises the typed
  * `mapPartitions` decode path (the one place the engine deliberately
  * leaves whole-stage codegen, as a real codec would); m03 exercises
  * deterministic frame sampling (posexplode + stride filter).
  */
object Multimodal extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- binary metadata: length, content digest, magic bytes -----------
    "m01_binary_meta" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("payload", $"text".cast("binary"))
        .select($"doc_id", $"source",
          length($"payload").cast("long").as("n_bytes"),
          lower(md5($"payload")).as("digest"),
          lower(hex(substring($"payload", 1, 4))).as("magic"))
        .orderBy($"doc_id")
    }),

    // -- caption-embedding alignment: the CLIP-score filter shape -------
    // The multimodal curation step that scores how well a caption
    // matches its media embedding and gates on the score (LAION's
    // CLIP-similarity filter). The real text encoder is a model; the
    // deterministic stand-in is a 64-dim signed feature-hash of the
    // caption's DISTINCT tokens (the t19 machinery at embedding
    // width), scored against the stored media embedding by SPARSE
    // inner product: the text vector stays as (doc_id, dim, weight)
    // rows, the embedding explodes to (doc_id, dim, v), and the score
    // is one equi-join + keyed sum — no dense-vector materialization,
    // no UDF, and the spelling both engines replay exactly. Per-source
    // report: docs, positive-alignment count (the gate), and the
    // score spread. Scale: tokens and dims are both bounded fan-outs
    // of one scan each; the join keys on (doc_id, dim) — co-located
    // if both sides land id-bucketed at rest.
    "m08_caption_alignment" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.operators.VectorSearch
      val docs = Tables(s, dir).documents
      val tok = docs
        .select($"doc_id", $"source",
          explode(array_distinct(split(lower($"text"), "\\s+"))).as("w"))
        .filter($"w" =!= "")
      val tv = tok
        .withColumn("h", PortableHash.sparkHash56($"w"))
        .select($"doc_id", expr("h % 64").as("dim"),
          expr("CASE WHEN (h div 64) % 2 = 0 THEN 1 ELSE -1 END")
            .cast("long").as("sgn"))
        .groupBy($"doc_id", $"dim").agg(sum($"sgn").as("tv"))
      val ev = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id".as("doc_id"), posexplode($"eq").as(Seq("dim", "v")))
        .select($"doc_id", $"dim".cast("long").as("dim"), $"v")
      val align = tv.join(ev, Seq("doc_id", "dim"))
        .groupBy($"doc_id").agg(sum($"tv" * $"v").as("align"))
      docs.select($"doc_id", $"source")
        .join(align, Seq("doc_id"), "left")
        .withColumn("align", coalesce($"align", lit(0L)))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"align" > 0, 1L).otherwise(0L)).as("n_aligned"),
          sum($"align").as("sum_align"),
          min($"align").as("min_align"),
          max($"align").as("max_align"))
        .orderBy($"source")
    }),

    // -- REAL image decode: binary PPM through the full parser ----------
    // The codec boundary exercised with a REAL format: binary PPM
    // (P6) is uncompressed, so decode is pure byte arithmetic and
    // this container can run it for real — no stub. Each document
    // gets a deterministic 8×8 RGB image generated CLOSED-FORM in
    // SQL (pixel byte i = (doc_id·31 + i·7) mod 256, assembled
    // hex→unhex under a fixed P6 header), and
    // [[graft.operators.PpmMediaCodec]] decodes it with the full
    // netpbm header grammar (comments, whitespace runs, dimension/
    // maxval validation, truncation → sentinel). The oracle
    // recomputes luma features from the same closed form WITHOUT
    // parsing — a differential test: general parser vs known layout,
    // hash-matched. At 100 TB the plan shape is m02's: prune to
    // (id, payload), decode in mapPartitions, wide binary dies at
    // the boundary. JPEG/PNG stay environment-bound behind the stub.
    "m09_ppm_decode_real" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      BinaryDecode.extractFeatures(s, ppmImages(s, dir),
          graft.operators.PpmMediaCodec)
        .toDF().orderBy($"doc_id")
    }),

    // -- REAL resize + perceptual hash over decoded pixels --------------
    // The other two codec kernels on the same real images: nearest-
    // neighbor resample 8×8 → 4×4 re-emitted as a VALID P6 (the
    // oracle rebuilds the exact output bytes — header included — so
    // the resized payload is compared hex-for-hex), and the classic
    // aHash over 16 nearest-neighbor luma samples (bit i set iff
    // luma·n > Σluma, division-free). This is the LAION-style image
    // fingerprint computed from real pixels; m05/m06 keep the stub
    // variants for the formats the container cannot decode.
    "m10_ppm_ahash_resize" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val imgs = ppmImages(s, dir)
      val ph = BinaryDecode.perceptualHashes(s, imgs, grid = 16,
        graft.operators.PpmMediaCodec).toDF()
      val rz = BinaryDecode.resize(s, imgs, target = 4,
          graft.operators.PpmMediaCodec).toDF()
        .select($"doc_id", lower(hex($"payload")).as("resized_hex"))
      ph.join(rz, Seq("doc_id"))
        .select($"doc_id", $"n_samples", $"ahash", $"resized_hex")
        .orderBy($"doc_id")
    }),

    // -- REAL audio decode: RIFF/PCM WAV through the chunk walk ---------
    // The audio sibling of m09: 16-bit PCM WAV is uncompressed, so
    // [[graft.operators.WavCodec]] decodes it for real — genuine RIFF
    // chunk grammar (foreign chunks skipped, odd sizes padded, fmt
    // validated as integer PCM), features per frame over channel 0:
    // absolute-amplitude mass and the sign-strict zero-crossing
    // count (the classic cheap pitch/noisiness proxy). Payloads are
    // closed-form mono 8 kHz files (sample j = signed 16-bit of
    // (doc_id·37 + j·211) mod 2^16 under the canonical 44-byte
    // header), so the oracle recomputes the features without a
    // parser — the m09 differential-test discipline on audio bytes.
    // MP3/AAC/FLAC remain environment-bound behind the stub.
    "m11_wav_decode_real" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val header = "52494646a400000057415645666d7420100000000100" +
        "0100401f0000803e00000200100064617461" + "80000000"
      val wavs = Tables(s, dir).documents.select($"doc_id",
        unhex(concat(lit(header),
          expr("concat_ws('', transform(sequence(0, 63), j -> concat(" +
            "lpad(hex((doc_id * 37 + j * 211) % 65536 % 256), 2, '0'), " +
            "lpad(hex(((doc_id * 37 + j * 211) % 65536) div 256)," +
            " 2, '0'))))"))).as("payload"))
      graft.operators.WavCodec.extract(s, wavs).toDF()
        .orderBy($"doc_id")
    }),

    // -- REAL video frame sampling: y4m through the container walk ------
    // Completes the uncompressed-media triple (m09 image, m11 audio):
    // YUV4MPEG2 is ffmpeg's raw interchange container, and
    // [[graft.operators.Y4mCodec]] walks it for real — stream-header
    // tag grammar, FRAME markers, planes sized by the colorspace tag
    // (skipping U/V correctly IS container decoding) — emitting m03's
    // frame sampling over DECODED frames: every 2nd frame's
    // luma-plane sum/min/max, the per-frame feature video curation
    // blocks on. Payloads are closed-form 4×4 C420 streams of 6
    // frames (Y byte p of frame f = (doc_id·13 + f·101 + p·7) mod
    // 256); the oracle recomputes the sampled stats without a parser.
    // H.264/VP9 remain environment-bound behind the stub.
    "m12_y4m_frames_real" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val vids = Tables(s, dir).documents.select($"doc_id",
        unhex(concat(lit("595556344d50454732205734204834204632353a310a"),
          expr("concat_ws('', transform(sequence(0, 5), f -> concat(" +
            "'4652414d450a', concat_ws('', transform(sequence(0, 23), " +
            "p -> lpad(hex((doc_id * 13 + f * 101 + p * 7) % 256), " +
            "2, '0'))))))"))).as("payload"))
      graft.operators.Y4mCodec.extract(s, vids, stride = 2).toDF()
        .orderBy($"doc_id", $"frame_idx")
    }),

    // -- REAL COMPRESSED-format decode: PNG via JDK zlib ----------------
    // The claim "compressed formats are environment-bound" was never
    // true for PNG on a JVM: DEFLATE ships in java.util.zip, and
    // everything else in PNG is byte arithmetic. m13 runs the REAL
    // pipeline: payloads are genuine PNGs produced by the codec's own
    // encoder over closed-form 8×8 RGB pixels WITH a row%5 filter
    // schedule (every filter type — None/Sub/Up/Average/Paeth — on
    // real data), then decoded by the full parser (chunk walk with
    // per-chunk CRC32 verification, IHDR validation, multi-IDAT
    // inflation, bytewise filter undo). The deflate BYTES are not
    // closed-form (so n_bytes is not emitted) but the decoded
    // FEATURES are — the oracle recomputes them pixel-exactly, which
    // makes the hash-match a full encoder→decoder round-trip proof
    // including the filter algebra. JPEG stays environment-bound
    // (entropy decode genuinely needs a library).
    "m13_png_decode_real" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      BinaryDecode.extractFeatures(s, pngImages(s, dir),
          graft.operators.PngMediaCodec)
        .toDF()
        .select($"doc_id", $"byte_sum", $"h0", $"h1", $"h2", $"h3")
        .orderBy($"doc_id")
    }),

    // -- PNG resize + aHash: the full kernel set on compressed input ----
    // m10's kernels through the PNG codec: aHash over the DECODED
    // luma of the compressed payload, and nearest-neighbor resize
    // re-encoded as a real PNG whose correctness is proven by
    // DECODING IT AGAIN — the re-decoded luma mass is closed-form
    // (sampled pixels), so the oracle pins the entire
    // decode→resample→encode→decode loop without ever seeing a
    // deflate byte.
    "m14_png_ahash_resize" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val imgs = pngImages(s, dir)
      val ph = BinaryDecode.perceptualHashes(s, imgs, grid = 16,
        graft.operators.PngMediaCodec).toDF()
      val rzf = BinaryDecode.extractFeatures(s,
          BinaryDecode.resize(s, imgs, target = 4,
            graft.operators.PngMediaCodec).toDF()
            .select($"doc_id", $"payload"),
          graft.operators.PngMediaCodec).toDF()
        .select($"doc_id", $"byte_sum".as("rz_byte_sum"))
      ph.join(rzf, Seq("doc_id"))
        .select($"doc_id", $"n_samples", $"ahash", $"rz_byte_sum")
        .orderBy($"doc_id")
    }),

    // -- REAL entropy-coded decode: JPEG via the JDK's own ImageIO ------
    // The first lossy format in the codec tier. The generator encodes
    // a per-doc RGB image (dimensions varying by doc_id) as a real
    // baseline JPEG through [[graft.operators.JpegMediaCodec]]; the
    // query decodes it back and emits ONLY the exact (non-lossy)
    // surface — decode success, dimensions, band count — which the
    // oracle recomputes closed-form. The lossy half (pixel-feature
    // determinism, encode→decode fixed point) is spec-pinned in
    // JpegCodecSpec, the split the oracle discipline demands for a
    // lossy codec. Same 100-TB shape as m13: wide payloads die at the
    // mapPartitions boundary, fixed-width rows flow on.
    "m15_jpeg_meta_imageio" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val w = 8 + (id % 5).toInt
          val h = 6 + (id % 3).toInt
          val rgb = Array.tabulate(w * h * 3)(i =>
            ((id * 31 + i * 7) % 256).toByte)
          graft.operators.JpegMediaCodec.meta(id,
            graft.operators.JpegMediaCodec.encodeRgb8(w, h, rgb))
        })
        .toDF()
        .select($"doc_id", $"ok", $"width", $"height", $"n_bands")
        .orderBy($"doc_id")
    }),

    // -- REAL compressed audio: G.711 μ-law through the RIFF walk -------
    // The first COMPRESSED audio format in the real tier: μ-law is
    // 8-bit logarithmic companding (2:1, the telephony standard) and
    // its expansion is exact integer arithmetic, so unlike JPEG the
    // decoded features stay fully closed-form for the oracle. The
    // generator writes real mono fmt-tag-7 WAV containers whose data
    // bytes follow (doc_id·7 + i·13) mod 256; the oracle re-derives
    // every decoded sample with the companding formula in SQL and
    // recomputes amplitude mass + sign-strict zero crossings — a
    // hash-match proves container walk AND companding. MP3/AAC-class
    // perceptual codecs remain behind the stub.
    "m16_ulaw_decode_real" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val wavs = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val data = Array.tabulate(400)(i =>
            ((id * 7 + i * 13) % 256).toByte)
          (id, graft.operators.WavCodec.wavContainer(
            fmtTag = 7, channels = 1, rate = 8000, bitsPerSample = 8,
            blockAlign = 1, data = data))
        }).toDF("doc_id", "payload")
      graft.operators.WavCodec.extract(s, wavs).toDF()
        .select($"doc_id", $"n_channels", $"sample_rate", $"n_samples",
          $"abs_sum", $"zero_crossings")
        .orderBy($"doc_id")
    }),

    // -- REAL predictive audio: IMA ADPCM (4-bit, stateful) -------------
    // The second compressed audio format: IMA ADPCM is differential
    // prediction with the public step/index tables — 4:1, exact
    // integer, but STATEFUL (each sample depends on the whole prefix),
    // so the oracle pins the exact SURFACE (dimensions: channels,
    // rate, sample count from the block structure) and the stateful
    // half is spec-pinned (WavCodecSpec: hand-computed first steps,
    // encode→decode tolerance on a smooth signal, determinism) — the
    // same lossy-codec oracle split as JPEG (m15).
    "m17_adpcm_meta" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val wavs = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val samples = Array.tabulate(260)(i =>
            (((id * 31 + i * i * 5) % 24000) - 12000).toInt)
          val data = graft.operators.WavCodec
            .adpcmEncodeMono(samples, blockAlign = 36)
          (id, graft.operators.WavCodec.wavContainer(
            fmtTag = 0x11, channels = 1, rate = 8000, bitsPerSample = 4,
            blockAlign = 36, data = data, samplesPerBlock = 65))
        }).toDF("doc_id", "payload")
      graft.operators.WavCodec.extract(s, wavs).toDF()
        .select($"doc_id", $"n_channels", $"sample_rate", $"n_samples",
          ($"n_samples" >= 0L).cast("long").as("ok"))
        .orderBy($"doc_id")
    }),

    // -- REAL compressed video: MJPEG frames in an AVI container --------
    // Container walk (RIFF LIST hdrl/movi) + per-frame entropy decode
    // (each 00dc chunk is a complete baseline JPEG through the JDK's
    // ImageIO) — real compressed VIDEO, leaving only inter-frame
    // codecs (H.264-class) behind the stub. Same oracle split as
    // m15/m17: frame count, sampled indices and dimensions are
    // closed-form; lossy luma values are spec-pinned (AviCodecSpec).
    "m18_avi_mjpeg_frames" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // 1-in-5 doc sample: the container walk is cheap but ImageIO
      // costs ~9 encode/decode calls per synthesized video — the
      // sample keeps the real-codec coverage without making this the
      // suite's tail query
      val avis = Tables(s, dir).documents.select($"doc_id").as[Long]
        .filter(_ % 5 == 0)
        .mapPartitions(_.map { id =>
          val frames = (0 until 6).map { f =>
            val rgb = Array.tabulate(8 * 8 * 3)(i =>
              ((id * 17 + f * 41 + i * 3) % 256).toByte)
            graft.operators.JpegMediaCodec.encodeRgb8(8, 8, rgb)
          }
          (id, graft.operators.AviCodec.aviMjpeg(8, 8, frames))
        }).toDF("doc_id", "payload")
      graft.operators.AviCodec.extract(s, avis, stride = 2).toDF()
        .select($"doc_id", $"width", $"height", $"n_frames",
          $"frame_idx")
        .orderBy($"doc_id", $"frame_idx")
    }),

    // -- REAL MP3 framing walk (entropy payload stays stubbed) ----------
    // What production audio curation does without decoding: hop
    // MPEG-1 Layer III frames by the spec's length arithmetic
    // (144·bitrate/samplerate + padding) after validating sync/
    // version/layer and table indices, skipping a leading ID3v2 tag
    // by its syncsafe length — yielding the VBR-aware frame census
    // and exact duration. The generator synthesizes real headers
    // with junk entropy payloads the walk must hop blind; every
    // emitted column is closed-form.
    "m19_mp3_frame_walk" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val mp3s = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val frames = (5 + id % 4).toInt
          val idxs = (0 until frames).map(f => (1 + (id + f) % 14).toInt)
          (id, graft.operators.Mp3Frames.synthesize(idxs, 0, id))
        }).toDF("doc_id", "payload")
      graft.operators.Mp3Frames.extract(s, mp3s).toDF()
        .select($"doc_id", $"n_frames", $"bitrate_kbps_sum",
          $"duration_ms")
        .orderBy($"doc_id")
    }),

    // -- REAL H.264 Annex-B NAL walk (CABAC payload stays stubbed) ------
    // The video twin of m19: start-code delimited NAL units with the
    // one-byte header census (SPS/PPS/IDR/non-IDR counts, payload
    // bytes) — the gate/dedup surface a video pipeline reads without
    // entropy decode. 4-byte start codes before parameter sets,
    // 3-byte before slices, forbidden-bit validation, zero-length
    // NALs to the sentinel.
    "m20_h264_nal_walk" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val streams = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val k = (3 + id % 3).toInt
          val plan = Seq((7, (10 + id % 5).toInt), (8, 6), (5,
            (50 + id % 20).toInt)) ++
            (0 until k).map(j => (1, 40 + j))
          (id, graft.operators.H264Nals.synthesize(plan, id))
        }).toDF("doc_id", "payload")
      graft.operators.H264Nals.extract(s, streams).toDF()
        .select($"doc_id", $"n_nals", $"n_sps", $"n_pps", $"n_idr",
          $"n_nonidr", $"payload_bytes")
        .orderBy($"doc_id")
    }),

    // -- REAL H.264 SPS decode: Exp-Golomb geometry ----------------------
    // Upgrades m20's NAL census to real header DECODE: the SPS payload
    // is pure entropy-coded syntax (ue(v) Exp-Golomb + fixed bits),
    // and it carries what a video curation gate filters on —
    // profile/level admission and cropped 4:2:0 dimensions. The
    // engine's own encoder writes the same syntax (emulation
    // prevention included), so decode-of-own-encode with a closed-form
    // oracle is the round-trip proof (the c18/m22 discipline). Widths
    // here are deliberately non-multiples of 16, so the frame-crop
    // arithmetic (16·mbs − 2·crop) is exercised on every row.
    // Remaining behind the stub after this: slice reconstruction
    // (CABAC/CAVLC residuals) only.
    "m26_h264_sps_decode" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val streams = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          (id, graft.operators.H264Sps.encode(
            width = (100 + (id % 7) * 2).toInt,
            height = (64 + (id % 5) * 2).toInt,
            profileIdc = 66,
            levelIdc = (30 + (id % 2) * 10).toInt))
        }).toDF("doc_id", "payload")
      graft.operators.H264Sps.extract(s, streams).toDF()
        .select($"doc_id", $"ok", $"profile_idc", $"level_idc",
          $"width", $"height", $"n_mbs")
        .orderBy($"doc_id")
    }),

    // -- REAL GIF decode: the SECOND entropy codec, LZW -----------------
    // GIF's variable-width LZW is genuine entropy coding (the other
    // is PNG's DEFLATE) and GIF is LOSSLESS, so the oracle is m13's
    // pixel-exact discipline, not m15's surface split: the hash-match
    // proves the entire encode→LZW→decode→palette loop — variable
    // code widths, clear codes and the KwKwK rule included — with
    // the oracle never seeing an LZW bit.
    "m21_gif_decode_real" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val gifs = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val gray = Array.tabulate(64)(p =>
            ((id * 23 + p * 7) % 256).toByte)
          (id, graft.operators.GifMediaCodec.encodeGray8(8, 8, gray))
        }).toDF("doc_id", "payload")
      BinaryDecode.extractFeatures(s, gifs,
          graft.operators.GifMediaCodec).toDF()
        .select($"doc_id", $"byte_sum", $"h0", $"h1", $"h2", $"h3")
        .orderBy($"doc_id")
    }),

    // -- REAL FLAC decode: the THIRD entropy codec, Rice coding ---------
    // FLAC's partitioned Rice residual coding is genuine entropy
    // coding — and FLAC is LOSSLESS, so this is the first
    // entropy-coded AUDIO format on the m13/m21 pixel-exact oracle
    // discipline (JPEG/ADPCM only pin their surface): the hash-match
    // proves frame sync, UTF-8 frame numbers, CRC-8/CRC-16, Rice
    // decode, and fixed-order prediction, with the oracle never
    // seeing a Rice bit. 600 samples over blockSize 256 force a
    // multi-frame stream with a partial last block.
    "m22_flac_decode_real" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val flacs = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val sig = Array.tabulate(600)(i =>
            (((id * 31 + i.toLong * 17) % 4001) - 2000).toInt)
          (id, graft.operators.FlacCodec.encodeMono(sig, 8000,
            blockSize = 256, order = 2))
        }).toDF("doc_id", "payload")
      graft.operators.FlacCodec.extract(s, flacs).toDF()
        .select($"doc_id", $"sample_rate", $"n_samples", $"abs_sum",
          $"zero_crossings", $"weighted_sum")
        .orderBy($"doc_id")
    }),

    // -- REAL inter-frame video: FLV / Sorenson Screen Video 1 ----------
    // Screen Video's only compression is DEFLATE, so a bare JVM runs
    // the whole format for real — FLV tag walk, bit-packed header,
    // per-block zlib, and the property no still-image codec has:
    // TEMPORAL composition. The generator emits a 40×24 gradient
    // keyframe (16×16 blocks → a 3×2 grid with clipped edge blocks)
    // plus 2–4 inter frames each rewriting one block to a constant;
    // the decoder replays the overlay and the oracle recomputes the
    // FINAL canvas closed-form (last-writer-wins per block) — the
    // hash-match proves framing, inflation and inter-frame state
    // without the oracle seeing an FLV byte. weighted_sum is
    // position-sensitive: a block composed at the wrong offset or a
    // stale block surviving a later write breaks it.
    "m23_flv_screen_video" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val flvs = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map(id => (id, svDemoStream(id))))
        .toDF("doc_id", "payload")
      graft.operators.FlvScreenVideo.extract(s, flvs).toDF()
        .select($"doc_id", $"n_frames", $"n_keyframes",
          $"blocks_updated", $"byte_sum", $"weighted_sum")
        .orderBy($"doc_id")
    }),

    // -- REAL perceptual-audio PAYLOAD: MPEG-1 Layer I ------------------
    // Unlike m19's MP3 frame walk (headers only), this decodes INSIDE
    // the psychoacoustic frame payload: 4-bit subband allocations,
    // CRC-16 over the protected span, 6-bit scalefactors, and the
    // 12-slot interleave of nb-bit quantized sample codes — all exact
    // integers, so the oracle recomputes the full census closed-form
    // (weighted_sum names frame, slot and subband: any interleave
    // mis-parse breaks the hash). Only the float synthesis filterbank
    // (pure DSP, no parsing) stays out of scope.
    "m24_mp1_subband_census" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val mp1s = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map(id => (id, mp1DemoStream(id))))
        .toDF("doc_id", "payload")
      graft.operators.Mp1Codec.extract(s, mp1s).toDF()
        .select($"doc_id", $"n_frames", $"kbps_sum", $"n_alloc",
          $"scf_sum", $"code_sum", $"weighted_sum")
        .orderBy($"doc_id")
    }),

    // -- from-scratch JPEG: the Huffman entropy layer -------------------
    // Huffman is the fourth from-scratch entropy codec (DEFLATE, LZW,
    // Rice, now this) and the one behind the classic lossy formats.
    // The generator emits REAL baseline JFIF (Annex K tables, DC
    // prediction, ZRL runs past 15 zeros, restart markers every 7
    // blocks) from closed-form quantized coefficients; the decoder
    // replays the whole entropy layer — canonical code construction
    // from DHT, EXTEND's one's-complement negatives, byte
    // unstuffing, RST-resync prediction resets — and the oracle
    // recomputes the coefficient census without seeing a JPEG bit.
    // JpegScratchSpec proves realness both directions against the
    // JDK's own ImageIO. The float IDCT half stays m15's territory.
    "m25_jpeg_coeff_census" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val jpgs = Tables(s, dir).documents.select($"doc_id").as[Long]
        .mapPartitions(_.map(id => (id, jpegDemoStream(id))))
        .toDF("doc_id", "payload")
      graft.operators.JpegScratch.extract(s, jpgs).toDF()
        .select($"doc_id", $"width", $"height", $"n_blocks",
          $"dc_sum", $"ac_nonzero", $"coeff_weighted")
        .orderBy($"doc_id")
    }),

    // -- stubbed decode via typed mapPartitions -------------------------
    "m02_stub_decode" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val binary = Tables(s, dir).documents
        .select($"doc_id", $"text".cast("binary").as("payload"))
      BinaryDecode.extractFeatures(s, binary).toDF()
        .orderBy($"doc_id")
    }),

    // -- media near-dup: banded perceptual-feature pairs ----------------
    // The image-dedup step of a multimodal pipeline (LAION-style):
    // decoded features → a compact perceptual signature → candidate
    // pairs ONLY inside a blocking band → exact verification. Here the
    // signature is the stub's decoded features (mean "luminance" +
    // 4-bin histogram, all integer per-mille) and verification is
    // |Δlum| ≤ 1 ∧ histogram L1 ≤ 8. Blocking is TWO-BAND: every
    // signature probes both its floor- and ceil-quantized luminance
    // band (`lum div 4` and `(lum+3) div 4`), so a pair straddling a
    // band edge — |Δlum| = 1 with the boundary between them, which a
    // single floor band forgoes by construction — still meets in one
    // of the two (the ceil band of the lower equals the floor band of
    // the higher). With the verify threshold Δ ≤ 1 < band width 4,
    // the two bands make blocking recall EXACT: no true pair is lost,
    // at ≤ 2× candidate cost (the standard adjacent-band trick).
    // Pairs meeting in both bands are deduped. The oracle blocks
    // identically, so semantics stay pinned. The feature frame is
    // persisted: it feeds both sides of the self-join, and the
    // mapPartitions decode must run once, not twice. At 100 TB:
    // decode once, store features; the pair join touches only the
    // fixed-width feature table, banded.
    "m05_media_neardup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val binary = Tables(s, dir).documents
        .select($"doc_id", $"text".cast("binary").as("payload"))
      val sgn = BinaryDecode.extractFeatures(s, binary).toDF()
        .select($"doc_id",
          expr("byte_sum * 1000 div n_bytes").as("lum_pm"),
          expr("h0 * 1000 div n_bytes").as("p0"),
          expr("h1 * 1000 div n_bytes").as("p1"),
          expr("h2 * 1000 div n_bytes").as("p2"),
          expr("h3 * 1000 div n_bytes").as("p3"))
        .withColumn("band", explode(array_distinct(array(
          expr("lum_pm div 4"), expr("(lum_pm + 3) div 4")))))
        .persist()
      def side(tag: String) = sgn.select(
        $"doc_id".as(s"d$tag"), $"band", $"lum_pm".as(s"lum$tag"),
        $"p0".as(s"p0$tag"), $"p1".as(s"p1$tag"),
        $"p2".as(s"p2$tag"), $"p3".as(s"p3$tag"))
      side("1").join(side("2"), Seq("band"))
        .filter($"d1" < $"d2")
        .withColumn("dl", abs($"lum1" - $"lum2"))
        .withColumn("l1", abs($"p01" - $"p02") + abs($"p11" - $"p12") +
          abs($"p21" - $"p22") + abs($"p31" - $"p32"))
        .filter($"dl" <= 1 && $"l1" <= 8)
        .select($"d1", $"d2", $"dl", $"l1")
        .distinct()
        .orderBy($"d1", $"d2")
    }),

    // -- perceptual average-hash: the media fingerprint INDEX -----------
    // The aHash of classic image dedup, over the stub-decoded samples:
    // stride-sample to a 32-cell grid (the resize stub = a real
    // build's pixel downsample), bit i = sample_i above the grid mean
    // (integer cross-multiplication, no division). Output is the
    // serving index a LAION-style pipeline stores per image — the
    // 32-bit hash plus its four 8-bit bands, which is exactly what a
    // banded Hamming-distance candidate join (the m05 machinery)
    // blocks on. 12 bytes/row flow out of the decode boundary; the
    // wide binary never leaves it.
    "m06_perceptual_hash" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val binary = Tables(s, dir).documents
        .select($"doc_id", $"text".cast("binary").as("payload"))
      BinaryDecode.perceptualHashes(s, binary, grid = 32).toDF()
        .select($"doc_id", $"n_samples", $"ahash",
          ($"ahash" % 256).as("b0"),
          (expr("shiftright(ahash, 8)") % 256).as("b1"),
          (expr("shiftright(ahash, 16)") % 256).as("b2"),
          expr("shiftright(ahash, 24)").as("b3"))
        .orderBy($"doc_id")
    }),

    // -- deterministic frame sampling: every 10th token as a "frame" ----
    "m03_frame_sample" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id", posexplode(split($"text", "\\s+"))
          .as(Seq("pos", "tok")))
        .filter($"pos" % 10 === 0)
        .select($"doc_id", ($"pos" / 10).cast("long").as("frame_no"),
          $"tok".as("frame"),
          PortableHash.sparkHash56($"tok").as("frame_hash"))
        .orderBy($"doc_id", $"frame_no")
    }),

    // -- stubbed resize: bytes → smaller bytes, metadata updated --------
    // Stride-downsample to ≤64 bytes per payload (the resample shape;
    // a codec swap makes it a real image resize). Digest of the output
    // proves the byte-exact transform crossed the mapPartitions
    // boundary intact.
    // INVARIANT (asserted below): the Spark side strides BYTES while
    // the DuckDB oracle strides CHARACTERS — identical only for pure
    // ASCII text. The assert_true filter makes any non-ASCII doc fail
    // this query loudly instead of silently diverging from the oracle.
    "m04_resize" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val binary = Tables(s, dir).documents
        .filter(assert_true($"text".isNull ||
          length($"text") === octet_length($"text"),
          lit("m04_resize requires ASCII text: byte-stride (Spark) vs " +
            "char-stride (oracle) diverge on multi-byte UTF-8")).isNull)
        .select($"doc_id", $"text".cast("binary").as("payload"))
      BinaryDecode.resize(s, binary, target = 64).toDF()
        .select($"doc_id", $"n_in",
          length($"payload").cast("long").as("n_out"),
          lower(md5($"payload")).as("digest"))
        .orderBy($"doc_id")
    }),

    // -- contrastive pair mining: positives + banded hard negatives -----
    // The CLIP-style training-prep step a multimodal corpus needs:
    // each document anchors a POSITIVE pair with its own media
    // (m06's perceptual hash) and a HARD NEGATIVE — the most
    // text-similar OTHER document (max integer embedding dot, ties to
    // the lower id) among its perceptual-band mates. Mining inside
    // the band keeps negatives "hard on the media axis" (visually
    // close) while the dot makes them hard on the text axis — and
    // bounds the search: candidates meet only within a band (118
    // bands at sf0.01, max 47 docs each), never all-pairs. Docs whose
    // band has no other member yield no row (no negative exists at
    // this hardness level — the standard fallback is a wider band).
    // At 100 TB: band the fingerprint table at rest
    // (partitionBy(band)) and the mining join is partition-local.
    "m07_contrastive_pairs" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.operators.VectorSearch
      val binary = Tables(s, dir).documents
        .select($"doc_id", $"text".cast("binary").as("payload"))
      val ph = BinaryDecode.perceptualHashes(s, binary, grid = 32).toDF()
        .select($"doc_id", $"ahash", expr("shiftright(ahash, 24)").as("band"))
      val emb = VectorSearch.quantize(Tables(s, dir).embeddings, "embedding")
        .select($"vec_id".as("doc_id"), $"eq")
      val sig = ph.join(emb, Seq("doc_id")).persist()
      val pairs = sig.select($"band", $"doc_id".as("a"),
          $"ahash".as("pos_hash"), $"eq".as("ea"))
        .join(sig.select($"band", $"doc_id".as("b"),
          $"ahash".as("neg_hash"), $"eq".as("eb")), Seq("band"))
        .filter($"a" =!= $"b")
        .withColumn("neg_dot", expr("graft_dotl(ea, eb)"))
      val w = Window.partitionBy($"a").orderBy($"neg_dot".desc, $"b")
      pairs.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        .select($"a".as("doc_id"), $"pos_hash", $"b".as("neg_doc"),
          $"neg_hash", $"neg_dot")
        .orderBy($"doc_id")
    })
  )

  /** m06's average-hash chain (bytes → stride samples → 32-bit hash),
    * shared by the m06 and m07 oracles — one spelling, referenced.
    */
  private val duckAhashCtes: String =
    """b AS (
      |  SELECT doc_id, list_transform(string_split(text, ''),
      |    x -> ascii(x)) AS bytes
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, bytes, len(bytes) AS n,
      |    greatest(1, len(bytes) // 32) AS stride
      |  FROM b),
      |sm AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0,
      |      least(32, (n - 1) // stride + 1) - 1),
      |      j -> bytes[j * stride + 1]) AS s
      |  FROM r),
      |h AS (
      |  SELECT doc_id, CAST(len(s) AS BIGINT) AS n_samples,
      |    CAST(COALESCE(list_sum(list_transform(
      |      generate_series(1, len(s)),
      |      j -> CASE WHEN s[j] * len(s) > list_sum(s)
      |           THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE 0 END)), 0)
      |      AS BIGINT) AS ahash
      |  FROM sm)""".stripMargin

  /** Deterministic 8×8 P6 images, one per document: header
    * `P6\n8 8\n255\n` (hex 50360a3820380a3235350a) + 192 pixel bytes
    * with byte i = (doc_id·31 + i·7) mod 256 — closed-form so the
    * oracle can recompute decoded features without a parser.
    */
  private def ppmImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).documents.select($"doc_id",
      unhex(concat(lit("50360A3820380A3235350A"),
        expr("concat_ws('', transform(sequence(0, 191), " +
          "i -> lpad(hex((doc_id * 31 + i * 7) % 256), 2, '0')))")))
        .as("payload"))
  }

  /** Genuine PNGs over closed-form 8×8 RGB pixels (byte i of doc d =
    * (d·29 + i·11) mod 256), encoded by the codec's own encoder with
    * the row%5 filter schedule — the deflate bytes are opaque, the
    * decoded pixels are closed-form.
    */
  private def pngImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).documents.select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val rgb = Array.tabulate(192)(i =>
          ((id * 29 + i * 11) % 256).toByte)
        (id, graft.operators.PngMediaCodec.encodeRgb8(8, 8, rgb))
      }).toDF("doc_id", "payload")
  }

  /** m23's deterministic Screen Video stream for one document: 40×24,
    * 16×16 blocks (3×2 grid, edge blocks clipped to 8 wide / 8 tall).
    * Keyframe luma at image-space pixel p (row-major, top-left) is
    * (id·23 + p·5) mod 256; inter frame f ∈ 1..F with F = 2 + id mod 3
    * rewrites block k = (id+f) mod 6 to the constant
    * (id·13 + f·29) mod 256 — all closed-form for the oracle.
    */
  private def svDemoStream(id: Long): Array[Byte] = {
    import graft.operators.FlvScreenVideo.SvFrame
    val w = 40; val h = 24; val bs = 16
    val nbx = 3
    def blockDims(k: Int): (Int, Int, Int, Int) = {
      val bx = k % nbx; val by = k / nbx
      (bx * bs, by * bs, math.min(bs, w - bx * bs), math.min(bs, h - by * bs))
    }
    val keyBlocks = (0 until 6).map { k =>
      val (x0, y0, bw, bh) = blockDims(k)
      k -> Array.tabulate(bw * bh) { q =>
        val p = (y0 + q / bw) * w + x0 + q % bw
        ((id * 23 + p * 5) % 256).toByte
      }
    }.toMap
    val inter = (1 to (2 + id % 3).toInt).map { f =>
      val k = ((id + f) % 6).toInt
      val (_, _, bw, bh) = blockDims(k)
      SvFrame(key = false, Map(k ->
        Array.fill(bw * bh)(((id * 13 + f * 29) % 256).toByte)))
    }
    graft.operators.FlvScreenVideo.encode(w, h, bs, bs,
      SvFrame(key = true, keyBlocks) +: inter)
  }

  /** m24's deterministic Layer I stream for one document: F = 3 + id
    * mod 3 frames at 224 kbps / 32 kHz mono; frame f allocates the 8
    * subbands with (id+f+sb) mod 4 = 0 at nb = 2 + (id+sb) mod 8 bits,
    * scalefactor (id·3+f·5+sb·7) mod 63, and sample code
    * (id + f·13 + sb·29 + q·3) mod 2^nb in slot q — all closed-form
    * for the oracle.
    */
  private def mp1DemoStream(id: Long): Array[Byte] = {
    import graft.operators.Mp1Codec.Mp1Frame
    val frames = (0 until (3 + id % 3).toInt).map { f =>
      val alloc = Array.tabulate(32)(sb =>
        if ((id + f + sb) % 4 == 0) (2 + (id + sb) % 8).toInt else 0)
      val scf = Array.tabulate(32)(sb =>
        ((id * 3 + f * 5 + sb * 7) % 63).toInt)
      val codes = Array.tabulate(32, 12) { (sb, q) =>
        if (alloc(sb) == 0) 0
        else ((id + f * 13 + sb * 29 + q * 3) % (1L << alloc(sb))).toInt
      }
      Mp1Frame(alloc, scf, codes)
    }
    graft.operators.Mp1Codec.encodeMono(frames)
  }

  /** m25's deterministic baseline JFIF for one document: 48×32 (24
    * blocks), restart interval 7. Block b carries three quantized
    * coefficients, closed-form: DC (id·17 + b·11) mod 256 − 128, an
    * early AC at zigzag 1 + (id+b) mod 5 valued (id + b·7) mod 31 −
    * 15 (may be zero — then it simply isn't coded), and a late AC at
    * zigzag 50 + b mod 10 valued 1 + (id + b·3) mod 7, whose ≥44-zero
    * gap forces real ZRL codes.
    */
  private def jpegDemoStream(id: Long): Array[Byte] = {
    val blocks = Array.tabulate(24) { b =>
      val zz = new Array[Int](64)
      zz(0) = (((id * 17 + b * 11) % 256) - 128).toInt
      zz(1 + ((id + b) % 5).toInt) = (((id + b * 7) % 31) - 15).toInt
      zz(50 + b % 10) = (1 + (id + b * 3) % 7).toInt
      zz
    }
    graft.operators.JpegScratch.encodeCoeffs(48, 32, blocks,
      restartInterval = 7)
  }

  override def oracles: Map[String, String] = Map(
    // pixel-exact closed-form recompute of the decoded luma features:
    // the hash-match proves encode(filter row%5)→deflate→inflate→
    // unfilter recovered every pixel
    "m13_png_decode_real" ->
      """WITH px AS (
        |  SELECT d.doc_id,
        |    ((d.doc_id * 29 + (3 * t.p) * 11) % 256) AS r,
        |    ((d.doc_id * 29 + (3 * t.p + 1) * 11) % 256) AS g,
        |    ((d.doc_id * 29 + (3 * t.p + 2) * 11) % 256) AS b
        |  FROM documents d CROSS JOIN generate_series(0, 63) AS t(p)),
        |lm AS (SELECT doc_id, (r + g + b) // 3 AS l FROM px)
        |SELECT doc_id,
        |  CAST(SUM(l) AS BIGINT) AS byte_sum,
        |  CAST(SUM(CASE WHEN l // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h0,
        |  CAST(SUM(CASE WHEN l // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h1,
        |  CAST(SUM(CASE WHEN l // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h2,
        |  CAST(SUM(CASE WHEN l // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h3
        |FROM lm GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // aHash samples pixel 4i; the re-decoded resize samples pixel
    // (2y)·8 + 2x — the loop decode→resample→encode→decode pinned
    // without a deflate byte in sight
    "m14_png_ahash_resize" ->
      """WITH cell AS (
        |  SELECT d.doc_id, t.i,
        |    (((d.doc_id * 29 + (3 * (4 * t.i)) * 11) % 256)
        |     + ((d.doc_id * 29 + (3 * (4 * t.i) + 1) * 11) % 256)
        |     + ((d.doc_id * 29 + (3 * (4 * t.i) + 2) * 11) % 256)) // 3
        |      AS l
        |  FROM documents d CROSS JOIN generate_series(0, 15) AS t(i)),
        |tot AS (SELECT doc_id, SUM(l) AS s FROM cell GROUP BY doc_id),
        |hs AS (
        |  SELECT c.doc_id, CAST(16 AS BIGINT) AS n_samples,
        |    CAST(SUM(CASE WHEN c.l * 16 > t.s
        |      THEN (CAST(1 AS BIGINT) << c.i) ELSE 0 END) AS BIGINT)
        |      AS ahash
        |  FROM cell c JOIN tot t USING (doc_id) GROUP BY c.doc_id),
        |rz AS (
        |  SELECT d.doc_id, CAST(SUM((
        |    ((d.doc_id * 29 + (3 * ((2 * (t.q // 4)) * 8 + 2 * (t.q % 4)))
        |      * 11) % 256)
        |    + ((d.doc_id * 29 + (3 * ((2 * (t.q // 4)) * 8 + 2 * (t.q % 4))
        |        + 1) * 11) % 256)
        |    + ((d.doc_id * 29 + (3 * ((2 * (t.q // 4)) * 8 + 2 * (t.q % 4))
        |        + 2) * 11) % 256)) // 3) AS BIGINT) AS rz_byte_sum
        |  FROM documents d CROSS JOIN generate_series(0, 15) AS t(q)
        |  GROUP BY d.doc_id)
        |SELECT hs.doc_id, hs.n_samples, hs.ahash, rz.rz_byte_sum
        |FROM hs JOIN rz ON hs.doc_id = rz.doc_id
        |ORDER BY hs.doc_id""".stripMargin,
    // closed-form μ-law expansion per byte (the CCITT formula in SQL)
    // + amplitude mass + LAG-based sign-strict zero crossings: the
    // hash-match proves RIFF walk AND companding, sample for sample
    "m16_ulaw_decode_real" ->
      """WITH smp AS (
        |  SELECT d.doc_id, t.i,
        |    255 - ((d.doc_id * 7 + t.i * 13) % 256) AS u
        |  FROM documents d CROSS JOIN generate_series(0, 399) AS t(i)),
        |dec AS (
        |  SELECT doc_id, i,
        |    CASE WHEN u >= 128 THEN
        |      -((((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132)
        |    ELSE
        |      (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
        |    END AS s
        |  FROM smp),
        |lagged AS (
        |  SELECT doc_id, i, s,
        |    LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM dec)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS n_channels,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(400 AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(s)) AS BIGINT) AS abs_sum,
        |  CAST(SUM(CASE WHEN i > 0 AND ((s < 0) != (prev < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM lagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // pixel-exact closed-form recompute of the GIF luma features —
    // the LZW round trip proven without an LZW bit on the oracle side
    "m21_gif_decode_real" ->
      """WITH px AS (
        |  SELECT d.doc_id,
        |    ((d.doc_id * 23 + t.p * 7) % 256) AS l
        |  FROM documents d CROSS JOIN generate_series(0, 63) AS t(p))
        |SELECT doc_id,
        |  CAST(SUM(l) AS BIGINT) AS byte_sum,
        |  CAST(SUM(CASE WHEN l // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h0,
        |  CAST(SUM(CASE WHEN l // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h1,
        |  CAST(SUM(CASE WHEN l // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h2,
        |  CAST(SUM(CASE WHEN l // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h3
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // sample-exact closed-form recompute of the FLAC features — the
    // Rice/prediction/CRC chain proven with the oracle never seeing
    // a FLAC bit (weighted_sum is order-sensitive: a swap or shift
    // of any two decoded samples breaks the hash)
    "m22_flac_decode_real" ->
      """WITH smp AS (
        |  SELECT d.doc_id, t.i,
        |    ((d.doc_id * 31 + t.i * 17) % 4001) - 2000 AS s
        |  FROM documents d CROSS JOIN generate_series(0, 599) AS t(i)),
        |lagged AS (
        |  SELECT doc_id, i, s,
        |    LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM smp)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(600 AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(s)) AS BIGINT) AS abs_sum,
        |  CAST(SUM(CASE WHEN i > 0 AND ((s < 0) != (prev < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
        |  CAST(SUM(s * (i + 1)) AS BIGINT) AS weighted_sum
        |FROM lagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // pixel-exact closed-form recompute of the FINAL composed canvas:
    // keyframe gradient overlaid by the last inter-frame write per
    // block (MAX(f) over the update schedule) — the FLV walk, zlib
    // blocks and temporal composition proven with the oracle never
    // seeing an FLV byte
    "m23_flv_screen_video" ->
      """WITH px AS (
        |  SELECT d.doc_id, t.p,
        |    ((d.doc_id * 23 + t.p * 5) % 256) AS keyl,
        |    ((t.p // 40) // 16) * 3 + ((t.p % 40) // 16) AS blk
        |  FROM documents d CROSS JOIN generate_series(0, 959) AS t(p)),
        |upd AS (
        |  SELECT d.doc_id, (d.doc_id + t.f) % 6 AS blk, MAX(t.f) AS fl
        |  FROM documents d CROSS JOIN generate_series(1, 4) AS t(f)
        |  WHERE t.f <= 2 + d.doc_id % 3
        |  GROUP BY d.doc_id, (d.doc_id + t.f) % 6),
        |fin AS (
        |  SELECT px.doc_id, px.p,
        |    CASE WHEN u.fl IS NULL THEN px.keyl
        |         ELSE (px.doc_id * 13 + u.fl * 29) % 256 END AS l
        |  FROM px LEFT JOIN upd u
        |    ON px.doc_id = u.doc_id AND px.blk = u.blk)
        |SELECT doc_id,
        |  CAST(3 + doc_id % 3 AS BIGINT) AS n_frames,
        |  CAST(1 AS BIGINT) AS n_keyframes,
        |  CAST(2 + doc_id % 3 AS BIGINT) AS blocks_updated,
        |  CAST(SUM(l) AS BIGINT) AS byte_sum,
        |  CAST(SUM(l * (p + 1)) AS BIGINT) AS weighted_sum
        |FROM fin GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // sample-code-exact closed-form recompute of the Layer I payload
    // census: allocation schedule, scalefactors and the quantized
    // codes all replayed in SQL — the bit-level frame parse (CRC-16,
    // 4-bit allocations, 6-bit scf, nb-bit interleaved codes) proven
    // with the oracle never seeing an MPEG bit
    "m24_mp1_subband_census" ->
      """WITH fr AS (
        |  SELECT d.doc_id, t.f
        |  FROM documents d CROSS JOIN generate_series(0, 4) AS t(f)
        |  WHERE t.f < 3 + d.doc_id % 3),
        |al AS (
        |  SELECT fr.doc_id, fr.f, s.sb,
        |    2 + (fr.doc_id + s.sb) % 8 AS nb,
        |    (fr.doc_id * 3 + fr.f * 5 + s.sb * 7) % 63 AS scf
        |  FROM fr CROSS JOIN generate_series(0, 31) AS s(sb)
        |  WHERE (fr.doc_id + fr.f + s.sb) % 4 = 0),
        |co AS (
        |  SELECT al.doc_id,
        |    (al.doc_id + al.f * 13 + al.sb * 29 + q.q * 3)
        |      % (CAST(1 AS BIGINT) << al.nb) AS code,
        |    al.f * 384 + q.q * 32 + al.sb + 1 AS w
        |  FROM al CROSS JOIN generate_series(0, 11) AS q(q)),
        |a1 AS (
        |  SELECT doc_id, COUNT(*) AS n_alloc, SUM(scf) AS scf_sum
        |  FROM al GROUP BY doc_id),
        |a2 AS (
        |  SELECT doc_id, SUM(code) AS code_sum,
        |    SUM(code * w) AS weighted_sum
        |  FROM co GROUP BY doc_id)
        |SELECT a1.doc_id,
        |  CAST(3 + a1.doc_id % 3 AS BIGINT) AS n_frames,
        |  CAST(224 * (3 + a1.doc_id % 3) AS BIGINT) AS kbps_sum,
        |  CAST(a1.n_alloc AS BIGINT) AS n_alloc,
        |  CAST(a1.scf_sum AS BIGINT) AS scf_sum,
        |  CAST(a2.code_sum AS BIGINT) AS code_sum,
        |  CAST(a2.weighted_sum AS BIGINT) AS weighted_sum
        |FROM a1 JOIN a2 ON a1.doc_id = a2.doc_id
        |ORDER BY a1.doc_id""".stripMargin,
    // coefficient-exact closed-form recompute of the JPEG census: DC
    // prediction chain, ZRL runs and restart resets all replayed by
    // the decoder, while the oracle only ever sees the generator's
    // coefficient formulas — the Huffman layer proven end to end
    "m25_jpeg_coeff_census" ->
      """WITH blk AS (
        |  SELECT d.doc_id, t.b,
        |    ((d.doc_id * 17 + t.b * 11) % 256) - 128 AS dc,
        |    1 + (d.doc_id + t.b) % 5 AS z1,
        |    ((d.doc_id + t.b * 7) % 31) - 15 AS v1,
        |    50 + (t.b % 10) AS z2,
        |    1 + (d.doc_id + t.b * 3) % 7 AS v2
        |  FROM documents d CROSS JOIN generate_series(0, 23) AS t(b))
        |SELECT doc_id,
        |  CAST(48 AS BIGINT) AS width,
        |  CAST(32 AS BIGINT) AS height,
        |  CAST(24 AS BIGINT) AS n_blocks,
        |  CAST(SUM(dc) AS BIGINT) AS dc_sum,
        |  CAST(SUM(CASE WHEN v1 != 0 THEN 2 ELSE 1 END) AS BIGINT)
        |    AS ac_nonzero,
        |  CAST(SUM(dc * (b * 64 + 1) + v1 * (b * 64 + z1 + 1)
        |    + v2 * (b * 64 + z2 + 1)) AS BIGINT) AS coeff_weighted
        |FROM blk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the MP3 walk's census is fully closed-form: per-frame bitrate
    // from the MPEG-1 Layer III table, duration = frames·1152/44100
    "m19_mp3_frame_walk" ->
      """WITH fr AS (
        |  SELECT d.doc_id, t.f,
        |    list_extract([32,40,48,56,64,80,96,112,128,160,192,224,
        |      256,320], CAST(1 + (d.doc_id + t.f) % 14 AS INTEGER))
        |      AS kbps
        |  FROM documents d CROSS JOIN generate_series(0, 8) AS t(f)
        |  WHERE t.f < 5 + d.doc_id % 4)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(kbps) AS BIGINT) AS bitrate_kbps_sum,
        |  CAST(COUNT(*) * 1152 * 1000 // 44100 AS BIGINT)
        |    AS duration_ms
        |FROM fr GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the NAL census closed-form from the generator's plan
    // closed form from the generator: every SPS decodes (ok=1) with
    // the generated profile/level/dims; n_mbs = ceil16(w)*ceil16(h)
    "m26_h264_sps_decode" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS ok,
        |  CAST(66 AS BIGINT) AS profile_idc,
        |  CAST(30 + (doc_id % 2) * 10 AS BIGINT) AS level_idc,
        |  CAST(100 + (doc_id % 7) * 2 AS BIGINT) AS width,
        |  CAST(64 + (doc_id % 5) * 2 AS BIGINT) AS height,
        |  CAST(((100 + (doc_id % 7) * 2 + 15) // 16)
        |    * ((64 + (doc_id % 5) * 2 + 15) // 16) AS BIGINT) AS n_mbs
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m20_h264_nal_walk" ->
      """SELECT doc_id,
        |  CAST(6 + doc_id % 3 AS BIGINT) AS n_nals,
        |  CAST(1 AS BIGINT) AS n_sps,
        |  CAST(1 AS BIGINT) AS n_pps,
        |  CAST(1 AS BIGINT) AS n_idr,
        |  CAST(3 + doc_id % 3 AS BIGINT) AS n_nonidr,
        |  CAST((10 + doc_id % 5) + 6 + (50 + doc_id % 20)
        |    + (3 + doc_id % 3) * 40
        |    + ((3 + doc_id % 3) * (2 + doc_id % 3)) // 2
        |    AS BIGINT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the MJPEG walk's exact surface: 6 frames per container, stride-2
    // sampling emits indices 0/2/4 at the generated dimensions
    "m18_avi_mjpeg_frames" ->
      """SELECT d.doc_id,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  CAST(6 AS BIGINT) AS n_frames,
        |  CAST(2 * t.k AS BIGINT) AS frame_idx
        |FROM documents d CROSS JOIN generate_series(0, 2) AS t(k)
        |WHERE d.doc_id % 5 = 0
        |ORDER BY d.doc_id, frame_idx""".stripMargin,
    // ADPCM's exact surface: the block structure fixes the sample
    // count ((36-4)*2+1 per block × 4 blocks); the stateful decode is
    // spec-pinned (see m17's scaladoc)
    "m17_adpcm_meta" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS n_channels,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(260 AS BIGINT) AS n_samples,
        |  CAST(1 AS BIGINT) AS ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the exact (non-lossy) surface of the ImageIO JPEG decode is
    // closed-form from the generator: every payload decodes (ok=1)
    // with the generated dimensions and 3 RGB bands
    "m15_jpeg_meta_imageio" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS ok,
        |  CAST(8 + doc_id % 5 AS BIGINT) AS width,
        |  CAST(6 + doc_id % 3 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS n_bands
        |FROM documents ORDER BY doc_id""".stripMargin,
    // closed-form luma recompute — no parser on the oracle side; the
    // hash-match proves the general netpbm parser read the same image
    "m09_ppm_decode_real" ->
      """WITH px AS (
        |  SELECT d.doc_id,
        |    ((d.doc_id * 31 + (3 * t.p) * 7) % 256) AS r,
        |    ((d.doc_id * 31 + (3 * t.p + 1) * 7) % 256) AS g,
        |    ((d.doc_id * 31 + (3 * t.p + 2) * 7) % 256) AS b
        |  FROM documents d CROSS JOIN generate_series(0, 63) AS t(p)),
        |lm AS (SELECT doc_id, (r + g + b) // 3 AS l FROM px)
        |SELECT doc_id, CAST(203 AS BIGINT) AS n_bytes,
        |  CAST(SUM(l) AS BIGINT) AS byte_sum,
        |  CAST(SUM(CASE WHEN l // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h0,
        |  CAST(SUM(CASE WHEN l // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h1,
        |  CAST(SUM(CASE WHEN l // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h2,
        |  CAST(SUM(CASE WHEN l // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS h3
        |FROM lm GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // sampled frames (f % 2 = 0) recomputed closed-form over the 16
    // Y-plane positions; chroma bytes never enter the features
    "m12_y4m_frames_real" ->
      """WITH yp AS (
        |  SELECT d.doc_id, t.f, u.p,
        |    ((d.doc_id * 13 + t.f * 101 + u.p * 7) % 256) AS y
        |  FROM documents d
        |  CROSS JOIN generate_series(0, 5) AS t(f)
        |  CROSS JOIN generate_series(0, 15) AS u(p)
        |  WHERE t.f % 2 = 0)
        |SELECT doc_id, CAST(4 AS BIGINT) AS width,
        |  CAST(4 AS BIGINT) AS height, CAST(6 AS BIGINT) AS n_frames,
        |  CAST(f AS BIGINT) AS frame_idx,
        |  CAST(SUM(y) AS BIGINT) AS y_sum,
        |  CAST(MIN(y) AS BIGINT) AS y_min,
        |  CAST(MAX(y) AS BIGINT) AS y_max
        |FROM yp GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin,

    // closed-form signed-16-bit recompute; LAG pairs adjacent frames
    // for the sign-strict crossing count
    "m11_wav_decode_real" ->
      """WITH sm AS (
        |  SELECT d.doc_id, t.j,
        |    CASE WHEN ((d.doc_id * 37 + t.j * 211) % 65536) >= 32768
        |         THEN ((d.doc_id * 37 + t.j * 211) % 65536) - 65536
        |         ELSE ((d.doc_id * 37 + t.j * 211) % 65536) END AS s
        |  FROM documents d CROSS JOIN generate_series(0, 63) AS t(j)),
        |zc AS (
        |  SELECT doc_id, s,
        |    LAG(s) OVER (PARTITION BY doc_id ORDER BY j) AS prev
        |  FROM sm)
        |SELECT doc_id, CAST(172 AS BIGINT) AS n_bytes,
        |  CAST(1 AS BIGINT) AS n_channels,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(64 AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(s)) AS BIGINT) AS abs_sum,
        |  CAST(SUM(CASE WHEN prev IS NOT NULL
        |    AND ((s < 0) <> (prev < 0)) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS zero_crossings
        |FROM zc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // aHash samples pixel 4i (i·64/16); resize samples pixel
    // (2·(q//4))·8 + 2·(q%4) — the oracle rebuilds the resized file
    // byte-for-byte including its rewritten header
    "m10_ppm_ahash_resize" ->
      """WITH cell AS (
        |  SELECT d.doc_id, t.i,
        |    (((d.doc_id * 31 + (3 * (4 * t.i)) * 7) % 256)
        |     + ((d.doc_id * 31 + (3 * (4 * t.i) + 1) * 7) % 256)
        |     + ((d.doc_id * 31 + (3 * (4 * t.i) + 2) * 7) % 256)) // 3
        |      AS l
        |  FROM documents d CROSS JOIN generate_series(0, 15) AS t(i)),
        |tot AS (SELECT doc_id, SUM(l) AS s FROM cell GROUP BY doc_id),
        |hs AS (
        |  SELECT c.doc_id, CAST(16 AS BIGINT) AS n_samples,
        |    CAST(SUM(CASE WHEN c.l * 16 > t.s
        |      THEN (CAST(1 AS BIGINT) << c.i) ELSE 0 END) AS BIGINT)
        |      AS ahash
        |  FROM cell c JOIN tot t USING (doc_id) GROUP BY c.doc_id),
        |rp AS (
        |  SELECT d.doc_id, t.q,
        |    (2 * (t.q // 4)) * 8 + 2 * (t.q % 4) AS p
        |  FROM documents d CROSS JOIN generate_series(0, 15) AS t(q)),
        |rz AS (
        |  SELECT doc_id,
        |    '50360a3420340a3235350a' || string_agg(
        |      lpad(lower(hex((doc_id * 31 + (3 * p) * 7) % 256)), 2, '0')
        |      || lpad(lower(hex((doc_id * 31 + (3 * p + 1) * 7) % 256)),
        |           2, '0')
        |      || lpad(lower(hex((doc_id * 31 + (3 * p + 2) * 7) % 256)),
        |           2, '0'), '' ORDER BY q) AS resized_hex
        |  FROM rp GROUP BY doc_id)
        |SELECT hs.doc_id, hs.n_samples, hs.ahash, rz.resized_hex
        |FROM hs JOIN rz ON hs.doc_id = rz.doc_id
        |ORDER BY hs.doc_id""".stripMargin,
    // sparse inner product replayed: signed 64-dim feature hash of
    // distinct caption tokens × the exploded quantized embedding
    "m08_caption_alignment" -> {
      val h = PortableHash.duckHash56("w")
      s"""WITH tok AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(list_distinct(
         |      regexp_split_to_array(lower(text), '\\s+'))) AS w
         |    FROM documents)
         |  WHERE w <> ''),
         |tv AS (
         |  SELECT doc_id, $h % 64 AS dim,
         |    CAST(SUM(CASE WHEN ($h // 64) % 2 = 0 THEN 1 ELSE -1 END)
         |      AS BIGINT) AS tv
         |  FROM tok GROUP BY doc_id, dim),
         |ev AS (
         |  SELECT vec_id AS doc_id, i - 1 AS dim,
         |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
         |      AS v
         |  FROM embeddings CROSS JOIN LATERAL
         |    (SELECT unnest(generate_series(1, len(embedding))) AS i)),
         |al AS (
         |  SELECT tv.doc_id, CAST(SUM(tv.tv * ev.v) AS BIGINT) AS align
         |  FROM tv JOIN ev ON tv.doc_id = ev.doc_id AND tv.dim = ev.dim
         |  GROUP BY tv.doc_id)
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN COALESCE(al.align, 0) > 0 THEN 1 ELSE 0
         |    END) AS BIGINT) AS n_aligned,
         |  CAST(SUM(COALESCE(al.align, 0)) AS BIGINT) AS sum_align,
         |  CAST(MIN(COALESCE(al.align, 0)) AS BIGINT) AS min_align,
         |  CAST(MAX(COALESCE(al.align, 0)) AS BIGINT) AS max_align
         |FROM documents d LEFT JOIN al ON d.doc_id = al.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin
    },
    "m01_binary_meta" ->
      """SELECT doc_id, source,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lower(md5(text)) AS digest,
        |  lower(hex(encode(substring(text, 1, 4)))) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m02_stub_decode" ->
      """WITH b AS (
        |  SELECT doc_id, list_transform(string_split(text, ''),
        |    x -> ascii(x)) AS bytes
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(bytes) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(bytes) AS BIGINT) AS byte_sum,
        |  CAST(len(list_filter(bytes, v -> v // 32 = 0)) AS BIGINT) AS h0,
        |  CAST(len(list_filter(bytes, v -> v // 32 = 1)) AS BIGINT) AS h1,
        |  CAST(len(list_filter(bytes, v -> v // 32 = 2)) AS BIGINT) AS h2,
        |  CAST(len(list_filter(bytes, v -> v // 32 >= 3)) AS BIGINT) AS h3
        |FROM b ORDER BY doc_id""".stripMargin,

    // same TWO-BAND blocking in the oracle (floor + ceil luminance
    // bands, pairs deduped) — semantics pinned, not accidental;
    // SUMs/abs arithmetic all integer
    "m05_media_neardup" ->
      """WITH b AS (
        |  SELECT doc_id, list_transform(string_split(text, ''),
        |    x -> ascii(x)) AS bytes
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CAST(len(bytes) AS BIGINT) AS n_bytes,
        |    CAST(list_sum(bytes) AS BIGINT) AS byte_sum,
        |    CAST(len(list_filter(bytes, v -> v // 32 = 0)) AS BIGINT) AS h0,
        |    CAST(len(list_filter(bytes, v -> v // 32 = 1)) AS BIGINT) AS h1,
        |    CAST(len(list_filter(bytes, v -> v // 32 = 2)) AS BIGINT) AS h2,
        |    CAST(len(list_filter(bytes, v -> v // 32 >= 3)) AS BIGINT) AS h3
        |  FROM b),
        |s0 AS (
        |  SELECT doc_id, byte_sum * 1000 // n_bytes AS lum_pm,
        |    h0 * 1000 // n_bytes AS p0, h1 * 1000 // n_bytes AS p1,
        |    h2 * 1000 // n_bytes AS p2, h3 * 1000 // n_bytes AS p3
        |  FROM f),
        |s AS (
        |  SELECT doc_id, lum_pm, p0, p1, p2, p3, band
        |  FROM s0 CROSS JOIN LATERAL (
        |    SELECT unnest(list_distinct(
        |      [lum_pm // 4, (lum_pm + 3) // 4])) AS band))
        |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(abs(a.lum_pm - b.lum_pm) AS BIGINT) AS dl,
        |  CAST(abs(a.p0-b.p0) + abs(a.p1-b.p1) + abs(a.p2-b.p2)
        |    + abs(a.p3-b.p3) AS BIGINT) AS l1
        |FROM s a JOIN s b ON a.band = b.band AND a.doc_id < b.doc_id
        |WHERE abs(a.lum_pm - b.lum_pm) <= 1
        |  AND abs(a.p0-b.p0) + abs(a.p1-b.p1) + abs(a.p2-b.p2)
        |    + abs(a.p3-b.p3) <= 8
        |ORDER BY d1, d2""".stripMargin,

    // resizeStub's stride arithmetic mirrored in list ops (1-based
    // lists: sample j lives at bytes[j*stride + 1]); the bit compare
    // is the same integer cross-multiplication, bits 0..31 so the
    // BIGINT sum is exact and non-negative
    "m06_perceptual_hash" ->
      s"""WITH $duckAhashCtes
        |SELECT doc_id, n_samples, ahash,
        |  ahash % 256 AS b0, (ahash >> 8) % 256 AS b1,
        |  (ahash >> 16) % 256 AS b2, ahash >> 24 AS b3
        |FROM h ORDER BY doc_id""".stripMargin,

    // the hard-negative pick is the same (dot DESC, id) total order
    // as the Spark window; dot is the s01 integer inner product
    "m07_contrastive_pairs" ->
      s"""WITH $duckAhashCtes,
        |band AS (
        |  SELECT doc_id, ahash, ahash >> 24 AS band FROM h),
        |e AS (
        |  SELECT vec_id AS doc_id, list_transform(embedding,
        |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS eq
        |  FROM embeddings),
        |sig AS (
        |  SELECT b.doc_id, b.ahash, b.band, e.eq
        |  FROM band b JOIN e ON b.doc_id = e.doc_id),
        |p AS (
        |  SELECT a.doc_id, a.ahash AS pos_hash, b.doc_id AS neg_doc,
        |    b.ahash AS neg_hash,
        |    CAST(list_sum(list_transform(generate_series(1, len(a.eq)),
        |      i -> a.eq[i] * b.eq[i])) AS BIGINT) AS neg_dot
        |  FROM sig a JOIN sig b
        |    ON a.band = b.band AND a.doc_id <> b.doc_id)
        |SELECT doc_id, pos_hash, neg_doc, neg_hash, neg_dot FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY neg_dot DESC, neg_doc) AS rk FROM p) t
        |WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "m03_frame_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
         |  FROM documents)
         |SELECT doc_id,
         |  CAST((i - 1) // 10 AS BIGINT) AS frame_no,
         |  toks[i] AS frame,
         |  ${PortableHash.duckHash56("toks[i]")} AS frame_hash
         |FROM t CROSS JOIN LATERAL (
         |  SELECT unnest(generate_series(1, len(toks))) AS i)
         |WHERE (i - 1) % 10 = 0
         |ORDER BY doc_id, frame_no""".stripMargin,

    "m04_resize" ->
      """WITH b AS (
        |  SELECT doc_id, string_split(text, '') AS chars,
        |    length(text) AS n
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n,
        |    list_transform(
        |      generate_series(0, least(63, (n - 1) // greatest(1, n // 64))),
        |      j -> chars[1 + j * greatest(1, n // 64)]) AS resized
        |  FROM b)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_in,
        |  CAST(len(resized) AS BIGINT) AS n_out,
        |  lower(md5(array_to_string(resized, ''))) AS digest
        |FROM r ORDER BY doc_id""".stripMargin
  )
}
