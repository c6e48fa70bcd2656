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

  private def sentinel(docId: Long) =
    Seq(WarcRecord(docId, -1L, "", "", 0L, 0L, 0L))

  private[operators] def gunzip(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  def records(docId: Long, gzBytes: Array[Byte]): Seq[WarcRecord] = {
    val bytes = gunzip(gzBytes) match {
      case None => return sentinel(docId)
      case Some(b) => b
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
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
      val version = readLine().getOrElse(return sentinel(docId))
      if (!version.startsWith("WARC/")) return sentinel(docId)
      var typ = ""
      var uri = ""
      var len = -1L
      var line = readLine().getOrElse(return sentinel(docId))
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
        line = readLine().getOrElse(return sentinel(docId))
      }
      if (len < 0 || i + len > n) return sentinel(docId)
      val body = new String(bytes, i, len.toInt, "UTF-8")
      i += len.toInt
      // two record-separator CRLFs
      if (i + 4 > n || bytes(i) != '\r' || bytes(i + 1) != '\n' ||
          bytes(i + 2) != '\r' || bytes(i + 3) != '\n')
        return sentinel(docId)
      i += 4
      val toks = body.split("\\s+").count(_.nonEmpty)
      out += WarcRecord(docId, idx.toLong, typ, uri, len,
        body.length.toLong, toks.toLong)
      idx += 1
    }
    if (out.isEmpty) sentinel(docId) else out.toSeq
  }

  /** Batched ingestion over a (doc_id, payload) projection. */
  def extract(spark: SparkSession,
      binary: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    binary.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => records(id, b) })
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
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      val ls = new String(out.toByteArray, "UTF-8")
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
