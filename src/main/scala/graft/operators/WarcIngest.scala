package graft.operators

import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REAL web-archive ingestion — the front door of every large text
  * corpus: Common Crawl ships as WARC records inside gzip members,
  * and BOTH layers decode for real here (gzip = JDK
  * `GZIPInputStream`; WARC/1.0 is a plain-text record grammar).
  *
  * The genuine framing, not a split-on-delimiter shortcut: each
  * record is a `WARC/1.0` version line, CRLF header lines
  * (case-insensitive names, unknown headers skipped), a blank line,
  * then EXACTLY `Content-Length` body bytes — bodies are free to
  * contain anything, including things that look like record
  * boundaries, which is why length-framing is the only correct read —
  * followed by the two record-separator CRLFs. A malformed stream
  * (truncated gzip, missing version line, bad/absent Content-Length,
  * body running past the buffer) yields the sentinel row
  * (`rec_idx = -1`), never an exception.
  *
  * Emitted per record: type, target URI, declared length, and the
  * first text features a curation funnel gates on (chars +
  * whitespace tokens) — the wide payload dies at this mapPartitions
  * boundary like every other codec in the engine.
  */
object WarcIngest {

  final case class WarcRecord(
      doc_id: Long,
      rec_idx: Long,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      n_chars: Long,
      n_tokens: Long)

  /** Hard ceiling on inflated bytes per archive member. A crafted
    * decompression bomb (a few KB expanding to multi-GB) must yield
    * the sentinel, not an executor OOM — the same totality contract
    * PngCodec enforces with its 1<<28 pixel cap.
    */
  private[operators] val MaxInflatedBytes: Long = 256L << 20

  /** Drain `in` into a byte array, bailing out (None) once the
    * running total exceeds [[MaxInflatedBytes]]. Shared by the gzip
    * (WARC/tar) and zstd (jsonl) front doors.
    */
  private[operators] def readCapped(
      in: java.io.InputStream): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      if (total > MaxInflatedBytes) { in.close(); return None }
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    Some(out.toByteArray)
  }

  private[operators] def gunzip(bytes: Array[Byte]): Option[Array[Byte]] =
    try readCapped(new GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }

  /** A fully-parsed record INCLUDING its body text — the curation
    * funnel's document. [[records]] projects this to fixed-width
    * features (metadata-only jobs); [[docs]] keeps the body (the
    * composed ingest→gate→dedup→pack pipeline, where the document
    * must flow on even though the compressed ARCHIVE dies at the
    * mapPartitions boundary).
    */
  final case class WarcDoc(
      doc_id: Long,
      rec_idx: Long,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      body: String)

  private def docSentinel(docId: Long) =
    Seq(WarcDoc(docId, -1L, "", "", 0L, ""))

  def records(docId: Long, gzBytes: Array[Byte]): Seq[WarcRecord] =
    docs(docId, gzBytes).map { d =>
      if (d.rec_idx < 0) WarcRecord(docId, -1L, "", "", 0L, 0L, 0L)
      else WarcRecord(docId, d.rec_idx, d.warc_type, d.target_uri,
        d.content_length, d.body.length.toLong,
        d.body.split("\\s+").count(_.nonEmpty).toLong)
    }

  def docs(docId: Long, gzBytes: Array[Byte]): Seq[WarcDoc] = {
    val bytes = gunzip(gzBytes) match {
      case None => return docSentinel(docId)
      case Some(b) => b
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcDoc]
    var i = 0
    val n = bytes.length
    def readLine(): Option[String] = {
      var j = i
      while (j + 1 < n && !(bytes(j) == '\r' && bytes(j + 1) == '\n'))
        j += 1
      if (j + 1 >= n) None
      else {
        val s = new String(bytes, i, j - i, "UTF-8")
        i = j + 2
        Some(s)
      }
    }
    var idx = 0
    while (i < n) {
      val version = readLine().getOrElse(return docSentinel(docId))
      if (!version.startsWith("WARC/")) return docSentinel(docId)
      var typ = ""
      var uri = ""
      var len = -1L
      var line = readLine().getOrElse(return docSentinel(docId))
      while (line.nonEmpty) {
        val k = line.indexOf(':')
        if (k > 0) {
          val name = line.substring(0, k).trim.toLowerCase
          val value = line.substring(k + 1).trim
          name match {
            case "warc-type" => typ = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              len = value.toLongOption.getOrElse(-1L)
            case _ => () // WARC-Date, WARC-Record-ID, … skipped
          }
        }
        line = readLine().getOrElse(return docSentinel(docId))
      }
      if (len < 0 || i + len > n) return docSentinel(docId)
      val body = new String(bytes, i, len.toInt, "UTF-8")
      i += len.toInt
      // two record-separator CRLFs
      if (i + 4 > n || bytes(i) != '\r' || bytes(i + 1) != '\n' ||
          bytes(i + 2) != '\r' || bytes(i + 3) != '\n')
        return docSentinel(docId)
      i += 4
      out += WarcDoc(docId, idx.toLong, typ, uri, len, body)
      idx += 1
    }
    if (out.isEmpty) docSentinel(docId) else out.toSeq
  }

  /** Batched ingestion over a (doc_id, payload) projection. */
  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => records(id, b) })
  }

  /** Batched ingestion keeping the DOCUMENT text (the composed
    * curation pipeline's front door — the archive dies here, the
    * document flows on).
    */
  def extractDocs(spark: SparkSession,
      binary: DataFrame): Dataset[WarcDoc] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => docs(id, b) })
  }
}

/** The third archive family a corpus pipeline meets: POSIX ustar —
  * `.tar.gz` bundles of text files (how Pile-style corpus components
  * ship). Tar is pure 512-byte-block framing: a header block (name,
  * 12-digit octal size, an 8-byte checksum computed with the
  * checksum field blanked to spaces), the body rounded up to whole
  * blocks, terminated by two zero blocks. The walk VERIFIES each
  * header checksum (both the unsigned-sum spec form and the
  * signed-sum historical form are accepted, per the format's
  * compatibility rule) and skips non-regular entries (directories,
  * symlinks) by typeflag. Gzip layer = JDK zlib, as in [[WarcIngest]].
  * Malformed archives (bad checksum, truncated body, non-octal size)
  * yield the sentinel (`entry_idx = -1`), never an exception.
  */
object TarIngest {

  final case class TarEntry(
      doc_id: Long,
      entry_idx: Long,
      name: String,
      n_bytes: Long,
      n_tokens: Long)

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var v = 0L
    var i = off
    var seen = false
    while (i < off + len && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < off + len && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; seen = true
    }
    if (seen) Some(v) else None
  }

  /** A regular-file entry INCLUDING its text — see
    * [[WarcIngest.WarcDoc]] for the records/docs split rationale.
    */
  final case class TarDoc(
      doc_id: Long,
      entry_idx: Long,
      name: String,
      n_bytes: Long,
      text: String)

  private def docSentinel(docId: Long) =
    Seq(TarDoc(docId, -1L, "", 0L, ""))

  def entries(docId: Long, gzBytes: Array[Byte]): Seq[TarEntry] =
    docs(docId, gzBytes).map { d =>
      if (d.entry_idx < 0) TarEntry(docId, -1L, "", 0L, 0L)
      else TarEntry(docId, d.entry_idx, d.name, d.n_bytes,
        d.text.split("\\s+").count(_.nonEmpty).toLong)
    }

  def docs(docId: Long, gzBytes: Array[Byte]): Seq[TarDoc] = {
    val bytes = WarcIngest.gunzip(gzBytes) match {
      case None => return docSentinel(docId)
      case Some(b) => b
    }
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[TarDoc]
    var i = 0
    var idx = 0
    while (i + 512 <= n) {
      if ((i until i + 512).forall(bytes(_) == 0)) return finish(out, docId)
      // checksum: header bytes summed with the chksum field (148..155)
      // read as spaces; unsigned or (historical) signed byte sums
      var us = 0L
      var ss = 0L
      var j = 0
      while (j < 512) {
        val raw: Int =
          if (j >= 148 && j < 156) ' ' else bytes(i + j)
        us += raw & 0xff
        ss += raw.toByte
        j += 1
      }
      val stored = octal(bytes, i + 148, 8)
        .getOrElse(return docSentinel(docId))
      if (stored != us && stored != ss) return docSentinel(docId)
      val name = cstr(bytes, i, 100)
      val size = octal(bytes, i + 124, 12)
        .getOrElse(return docSentinel(docId))
      val typeflag = bytes(i + 156)
      val body = i + 512
      if (body + size > n) return docSentinel(docId)
      if (typeflag == 0 || typeflag == '0') { // regular file
        out += TarDoc(docId, idx.toLong, name, size,
          new String(bytes, body, size.toInt, "UTF-8"))
        idx += 1
      }
      i = body + ((size + 511) / 512 * 512).toInt
    }
    finish(out, docId)
  }

  private def finish(out: scala.collection.mutable.ArrayBuffer[TarDoc],
      docId: Long): Seq[TarDoc] =
    if (out.isEmpty) docSentinel(docId) else out.toSeq

  /** Real ustar writer for the generators: proper octal fields and
    * checksum, bodies padded to blocks, two-zero-block terminator.
    */
  def tarGz(files: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    files.foreach { case (name, content) =>
      val body = content.getBytes("UTF-8")
      val hdr = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      System.arraycopy(nb, 0, hdr, 0, math.min(nb.length, 100))
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = v.toOctalString.reverse.padTo(len - 1, '0').reverse
        val sb = s.getBytes("US-ASCII")
        System.arraycopy(sb, 0, hdr, off, len - 1)
      }
      oct(420, 100, 8) // mode 0644
      oct(0, 108, 8); oct(0, 116, 8)
      oct(body.length.toLong, 124, 12)
      oct(0, 136, 12)
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      hdr(156) = '0'
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, hdr, 257, 5)
      var sum = 0L
      (0 until 512).foreach(j => sum += hdr(j) & 0xff)
      val cs = sum.toOctalString.reverse.padTo(6, '0').reverse
      System.arraycopy(cs.getBytes("US-ASCII"), 0, hdr, 148, 6)
      hdr(154) = 0; hdr(155) = ' '
      bos.write(hdr)
      bos.write(body)
      val pad = (512 - body.length % 512) % 512
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024))
    val out = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(out)
    g.write(bos.toByteArray); g.close()
    out.toByteArray
  }

  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[TarEntry] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => entries(id, b) })
  }

  /** Batched ingestion keeping the entry TEXT — the tar face of
    * [[WarcIngest.extractDocs]].
    */
  def extractDocs(spark: SparkSession,
      binary: DataFrame): Dataset[TarDoc] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => docs(id, b) })
  }
}

/** The OTHER standard corpus wire format: zstd-compressed JSONL
  * (`.jsonl.zst` — what modern training stacks ship instead of
  * WARC.gz). The zstd codec is REAL and already on the engine's
  * classpath — Spark itself links zstd-jni for shuffle/parquet
  * compression — so decoding it adds no dependency. This operator
  * does exactly the byte-layer half (streaming decompress + line
  * split); the JSON half belongs to Spark's NATIVE `from_json`
  * downstream, which is the point: after the mapPartitions boundary
  * the plan is codegen'd columnar parsing, not UDF string handling.
  * Malformed members (bad magic, truncated frames) yield the
  * sentinel (`rec_idx = -1`), never an exception.
  */
object ZstdLines {

  final case class JsonlLine(doc_id: Long, rec_idx: Long, line: String)

  def lines(docId: Long, zstBytes: Array[Byte]): Seq[JsonlLine] =
    try {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(zstBytes))
      val inflated = WarcIngest.readCapped(in) match {
        case None => return Seq(JsonlLine(docId, -1L, "")) // bomb cap
        case Some(b) => b
      }
      val ls = new String(inflated, "UTF-8")
        .split("\n", -1).filter(_.nonEmpty)
      if (ls.isEmpty) Seq(JsonlLine(docId, -1L, ""))
      else ls.zipWithIndex.map { case (l, i) =>
        JsonlLine(docId, i.toLong, l)
      }.toSeq
    } catch {
      case _: java.io.IOException => Seq(JsonlLine(docId, -1L, ""))
    }

  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[JsonlLine] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => lines(id, b) })
  }
}
