package graft.operators

import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** The real WARC-over-gzip reader: Content-Length framing (bodies
  * containing fake record boundaries must NOT split), header grammar,
  * multi-record streams, and the malformed classes.
  */
class WarcIngestSpec extends AnyFunSuite {

  private def gz(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(out)
    g.write(s.getBytes("UTF-8")); g.close()
    out.toByteArray
  }

  private def rec(typ: String, uri: String, body: String,
      extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
      s"WARC-Target-URI: $uri\r\n$extra" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" +
      body + "\r\n\r\n"

  test("two records with extra headers parse; token stats computed") {
    val w = rec("response", "http://a/1", "hello  warc world",
      extra = "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        "WARC-Record-ID: <urn:uuid:x>\r\n") +
      rec("metadata", "http://a/2", "one two")
    val got = WarcIngest.records(5L, gz(w))
    assert(got.map(r => (r.rec_idx, r.warc_type, r.target_uri,
      r.n_tokens)) ===
      Seq((0L, "response", "http://a/1", 3L),
        (1L, "metadata", "http://a/2", 2L)))
  }

  test("length framing: a body containing WARC/1.0 does not split") {
    val body = "decoy\r\n\r\nWARC/1.0\r\nfake: header\r\n\r\nstill body"
    val got = WarcIngest.records(1L, gz(rec("response", "http://b", body)))
    assert(got.size === 1)
    assert(got.head.n_chars === body.length.toLong)
  }

  test("header names are case-insensitive") {
    val body = "x"
    val w = "WARC/1.0\r\nwarc-type: response\r\n" +
      "CONTENT-LENGTH: 1\r\n\r\n" + body + "\r\n\r\n"
    val got = WarcIngest.records(2L, gz(w))
    assert(got.head.warc_type === "response" &&
      got.head.content_length === 1L)
  }

  test("zstd lines: round-trip split and malformed sentinel") {
    val text = "line one\nline two\n\nline three"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(text.getBytes("UTF-8")); z.close()
    val got = ZstdLines.lines(7L, bos.toByteArray)
    assert(got.map(_.line) === Seq("line one", "line two", "line three"))
    assert(got.map(_.rec_idx) === Seq(0L, 1L, 2L))
    for (bad <- Seq("not zstd".getBytes("UTF-8"),
        bos.toByteArray.dropRight(3), Array.emptyByteArray))
      assert(ZstdLines.lines(9L, bad).map(_.rec_idx) === Seq(-1L))
  }

  test("tar.gz entries: checksum-verified walk, padding, terminator") {
    val t = TarIngest.tarGz(Seq(
      ("a/one.txt", "alpha beta gamma"),
      ("a/two.txt", "x" * 600), // body spans two blocks
      ("a/empty.txt", "")))
    val got = TarIngest.entries(4L, t)
    assert(got.map(e => (e.entry_idx, e.name, e.n_bytes, e.n_tokens)) ===
      Seq((0L, "a/one.txt", 16L, 3L), (1L, "a/two.txt", 600L, 1L),
        (2L, "a/empty.txt", 0L, 0L)))
  }

  test("tar malformed classes yield the sentinel") {
    val good = TarIngest.tarGz(Seq(("f.txt", "hi")))
    val raw = WarcIngest.gunzip(good).get
    val badCksum = raw.clone(); badCksum(0) = (badCksum(0) ^ 1).toByte
    def regz(b: Array[Byte]) = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new GZIPOutputStream(out); g.write(b); g.close()
      out.toByteArray
    }
    val cases = Seq(
      "plain bytes".getBytes("UTF-8"), // not gzip
      regz(badCksum), // header corrupted → checksum mismatch
      regz(raw.take(512)), // truncated body
      regz(Array.emptyByteArray))
    for (b <- cases)
      assert(TarIngest.entries(9L, b).map(_.entry_idx) === Seq(-1L),
        s"expected sentinel for ${b.length}B")
  }

  test("malformed streams yield the sentinel, never throw") {
    val good = gz(rec("response", "http://c", "abc"))
    val cases: Seq[Array[Byte]] = Seq(
      "not gzip at all".getBytes("UTF-8"),
      good.dropRight(4), // truncated gzip member (CRC missing)
      gz("HTTP/1.1 200 OK\r\n\r\n"), // not a WARC version line
      gz("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"), // no length
      gz("WARC/1.0\r\nContent-Length: 999\r\n\r\nshort\r\n\r\n"), // overrun
      gz("WARC/1.0\r\nContent-Length: 3\r\n\r\nabcXX"), // bad separator
      gz(""), // empty member
      Array.emptyByteArray)
    for (b <- cases) {
      val got = WarcIngest.records(9L, b)
      assert(got.map(_.rec_idx) === Seq(-1L),
        s"expected sentinel for ${b.length}B")
    }
  }

  test("decompression bomb hits the inflated-byte cap, not the heap") {
    // ~260 MB of zeros gzips to ~260 KB: a crafted member like this
    // must yield the sentinel once MaxInflatedBytes is crossed rather
    // than buffering multi-GB on an executor
    val zeros = new Array[Byte](1 << 20)
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    for (_ <- 0 until 261) g.write(zeros)
    g.close()
    val gzBomb = bos.toByteArray
    assert(gzBomb.length < (1 << 21), "bomb premise: tiny compressed")
    assert(WarcIngest.records(10L, gzBomb).map(_.rec_idx) === Seq(-1L))
    assert(TarIngest.entries(10L, gzBomb).map(_.entry_idx) === Seq(-1L))
    // same for the zstd front door
    val zos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(zos)
    for (_ <- 0 until 261) z.write(zeros)
    z.close()
    assert(ZstdLines.lines(10L, zos.toByteArray).map(_.rec_idx) ===
      Seq(-1L))
  }
}
