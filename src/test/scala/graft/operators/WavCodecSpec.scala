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
}
