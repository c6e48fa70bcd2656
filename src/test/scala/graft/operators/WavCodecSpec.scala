package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import graft.operators.WavCodec.WavFeatures
import org.scalatest.funsuite.AnyFunSuite

/** The real RIFF/PCM parser against hand-built files: chunk walk
  * (foreign chunks, odd-size padding), mono and stereo channel-0
  * stats, and every malformed class mapped to the sentinel.
  */
class WavCodecSpec extends AnyFunSuite {

  private def wav(channels: Int, rate: Int, samples: Seq[Int],
      preChunks: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    val db = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => db.putShort(s.toShort))
    val pre = preChunks.flatMap { case (id, body) =>
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array[Byte]()
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }.toArray
    val fmt = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    fmt.putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * 2 * channels).putShort((2 * channels).toShort)
      .putShort(16)
    val chunks = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ fmt.array() ++
      pre ++ "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(4 + chunks.length) ++
      "WAVE".getBytes("US-ASCII") ++ chunks
  }

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  test("mono PCM: abs sum and sign-strict zero crossings") {
    val b = wav(1, 8000, Seq(100, -200, 0, -5, 7))
    // crossings: 100→-200 (1), -200→0 (2), 0→-5 (3), -5→7 (4)
    assert(WavCodec.decode(1L, b) ===
      WavFeatures(1L, b.length.toLong, 1L, 8000L, 5L, 312L, 4L))
  }

  test("stereo: stats come from channel 0 only, frame stride honored") {
    // frames: (10, 999), (-10, 999) — channel 1 must not leak in
    val b = wav(2, 44100, Seq(10, 999, -10, 999))
    assert(WavCodec.decode(2L, b) ===
      WavFeatures(2L, b.length.toLong, 2L, 44100L, 2L, 20L, 1L))
  }

  test("foreign chunks before data are skipped, odd sizes padded") {
    val b = wav(1, 8000, Seq(1, 2),
      preChunks = Seq(("LIST", Array[Byte](1, 2, 3)))) // odd size → pad
    val f = WavCodec.decode(3L, b)
    assert(f.n_samples === 2L && f.abs_sum === 3L)
  }

  test("malformed payloads yield the sentinel, never throw") {
    val good = wav(1, 8000, Seq(1, 2, 3))
    val cases = Seq(
      "not riff at all".getBytes("US-ASCII"),
      good.take(20), // truncated mid-fmt
      good.dropRight(2), // truncated data chunk
      { val c = good.clone(); c(20) = 3; c }, // fmt tag 3 (float PCM)
      Array.emptyByteArray)
    for (b <- cases) {
      val f = WavCodec.decode(9L, b)
      assert(f.n_samples === -1L, s"expected sentinel for ${b.length}B")
    }
  }

  test("INT16.MIN amplitude does not overflow the abs sum") {
    val b = wav(1, 8000, Seq(-32768, -32768))
    assert(WavCodec.decode(4L, b).abs_sum === 65536L)
  }

  test("u-law: known companding points + encode-decode round trip") {
    // CCITT reference points (positive samples encode to 0x80–0xFF
    // after the trailing complement): 0xFF -> +0, 0x7F -> -0,
    // 0x80 -> +32124 (max), 0x00 -> -32124 (min)
    assert(WavCodec.ulawToLinear(0xff.toByte) === 0)
    assert(WavCodec.ulawToLinear(0x7f.toByte) === 0)
    assert(WavCodec.ulawToLinear(0x80.toByte) === 32124)
    assert(WavCodec.ulawToLinear(0x00.toByte) === -32124)
    // and encode is the exact inverse at the extremes
    assert(WavCodec.linearToUlaw(32124) === 0x80.toByte)
    assert(WavCodec.linearToUlaw(-32124) === 0x00.toByte)
    // compress→expand must be near-identity (within segment quantum)
    for (s <- Seq(0, 1, -1, 100, -100, 1000, -5000, 20000, -32000)) {
      val rt = WavCodec.ulawToLinear(WavCodec.linearToUlaw(s))
      assert(math.abs(rt - s) <= math.max(8, math.abs(s) / 16),
        s"round trip $s -> $rt outside companding tolerance")
    }
  }

  test("u-law WAV container decodes for real (fmt tag 7)") {
    val data = Array.tabulate(64)(i => ((i * 13 + 7) % 256).toByte)
    val b = WavCodec.wavContainer(7, 1, 8000, 8, 1, data)
    val f = WavCodec.decode(5L, b)
    assert(f.n_samples === 64L && f.n_channels === 1L &&
      f.sample_rate === 8000L)
    val expected = data.map(x => math.abs(
      WavCodec.ulawToLinear(x).toLong)).sum
    assert(f.abs_sum === expected)
  }

  test("IMA ADPCM: hand-computed first steps (pred 0, index 0)") {
    // block: header pred=0 idx=0, first byte nibbles (3, 0x0B):
    //   step=7, n=3: diff = 0 + 3 + 1 = 4 -> s=4,  idx 0 + (-1) -> 0
    //   step=7, n=B: sign bit, mag 3 -> s = 4 - 4 = 0, idx stays 0
    val block = new Array[Byte](8)
    block(4) = ((0x0b << 4) | 0x03).toByte
    val b = WavCodec.wavContainer(0x11, 1, 8000, 4, 8, block,
      samplesPerBlock = 9)
    val f = WavCodec.decode(6L, b)
    // samples: 0 (header), 3->4, B->0, then 6 zero nibbles decay
    assert(f.n_samples === 9L)
    assert(f.abs_sum >= 4L, s"first delta lost: $f")
  }

  test("IMA ADPCM: encode→decode tracks a smooth signal") {
    val samples = Array.tabulate(130)(i =>
      (8000 * math.sin(i / 8.0)).toInt)
    val data = WavCodec.adpcmEncodeMono(samples, blockAlign = 36)
    val b = WavCodec.wavContainer(0x11, 1, 8000, 4, 36, data,
      samplesPerBlock = 65)
    val f = WavCodec.decode(7L, b)
    assert(f.n_samples === 130L)
    // determinism
    assert(WavCodec.decode(7L, b) === f)
    // the decoded amplitude mass tracks the original within ADPCM's
    // adaptation error on a smooth signal
    val origMass = samples.map(s => math.abs(s.toLong)).sum
    assert(math.abs(f.abs_sum - origMass) < origMass / 5,
      s"ADPCM mass drifted: ${f.abs_sum} vs $origMass")
  }

  test("compressed-format malformed classes yield the sentinel") {
    val good = WavCodec.wavContainer(0x11, 1, 8000, 4, 36,
      WavCodec.adpcmEncodeMono(Array.fill(65)(100), 36),
      samplesPerBlock = 65)
    val cases = Seq(
      WavCodec.wavContainer(7, 1, 8000, 16, 1,
        Array[Byte](1, 2)), // u-law must be 8-bit
      WavCodec.wavContainer(0x11, 2, 8000, 4, 36,
        new Array[Byte](36), samplesPerBlock = 65), // stereo ADPCM
      {
        val bad = good.clone() // step index 99 > 88 in block header
        bad(good.length - 36 + 2) = 99.toByte
        bad
      })
    for (b <- cases)
      assert(WavCodec.decode(9L, b).n_samples === -1L)
  }
}
