package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal versioned-manifest table format — the commit protocol
  * that makes writes ATOMIC on an object store, which a bare parquet
  * directory cannot be (x36's documented caveat: a crash mid-swap is
  * re-runnable but not invisible).
  *
  * The design is the published core of Delta Lake (Armbrust et al.,
  * "Delta Lake: High-Performance ACID Table Storage over Cloud Object
  * Stores", VLDB 2020) and Iceberg's spec, reduced to its invariant:
  *
  *   - data files are IMMUTABLE and never listed by readers; the
  *     manifest `_manifests/v<N>.json` names the exact file set of
  *     version N;
  *   - a commit is ONE atomic create-if-absent of `v<N+1>.json`
  *     (`FileSystem.create(overwrite = false)` — the same primitive
  *     Delta uses on HDFS-like stores). Two concurrent writers race
  *     on the same next version; the loser gets FileAlreadyExists,
  *     re-reads the new latest, and retries on top — optimistic
  *     concurrency, no locks;
  *   - readers resolve a version ONCE (latest or AS OF) and read only
  *     its files: snapshot isolation for free — a reader planned at
  *     v2 never sees v3's files, no matter when v3 commits;
  *   - old versions stay readable (time travel) until `vacuum`, which
  *     deletes only files unreachable from the kept manifests.
  *
  * Scale note: the manifest lists file PATHS (+ per-file row counts
  * for verification) — O(#files) driver-side metadata, same contract
  * as [[Compaction.planBins]]. At millions of files production
  * formats shard manifests and checkpoint them; one JSON per version
  * is the honest small-scale spelling of the same protocol.
  */
object ManifestTable {

  /** `lo`/`hi`: min/max of the table's declared stats column within
    * this file — the Delta/Iceberg file-level statistics that let a
    * range predicate skip files from the MANIFEST, before any footer
    * is opened. */
  final case class ManifestEntry(path: String, rows: Long,
      lo: Option[Long] = None, hi: Option[Long] = None)

  /** `compaction = true` marks a version whose commit changed FILES
    * but not CONTENT (Delta's dataChange=false) — a change-feed tail
    * must skip it or it double-counts every compacted row. `txn` is
    * the writer's idempotence marker (Delta's txn action): a
    * streaming sink stamps each commit with its (queryId, batchId)
    * and skips the append when the marker is already in the log. */
  /** `schemaDdl`: the table schema OF THIS VERSION, carried in the
    * log (Delta's metaData action) — readers take the schema from the
    * manifest, never from file footers, so files written before a
    * column existed read back with that column null. */
  final case class Snapshot(version: Int, entries: Vector[ManifestEntry],
      compaction: Boolean = false, txn: Option[String] = None,
      schemaDdl: Option[String] = None) {
    def paths: Vector[String] = entries.map(_.path)
    def rows: Long = entries.map(_.rows).sum
  }

  private def manifestDir(dir: String) = new Path(dir, "_manifests")

  /** Zero-padded so lexicographic file order == version order — a
    * file-stream tail of `_manifests` then sees commits in commit
    * order even when mtimes tie within a timestamp granule. */
  private[operators] def manifestName(v: Int) = f"v$v%06d.json"
  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed versions, ascending (empty if uninitialized). */
  def versions(spark: SparkSession, dir: String): Vector[Int] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) Vector.empty
    else f.listStatus(md).toVector
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted
  }

  /** Resolve a snapshot: latest, or AS OF an exact version. */
  def snapshot(spark: SparkSession, dir: String,
      asOf: Option[Int] = None): Snapshot = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no manifest at $dir")
    val v = asOf match {
      case Some(x) =>
        require(vs.contains(x), s"version $x not in ${vs.mkString(",")}")
        x
      case None => vs.last
    }
    val f = fs(spark, dir)
    // a manifest can be VISIBLE before its writer closes it (the
    // create-if-absent commit point makes the file exist first): an
    // unparsable body means a commit in flight — re-read briefly
    // rather than failing a reader that raced the winning writer
    var attempt = 0
    while (true) {
      val in = f.open(new Path(manifestDir(dir), manifestName(v)))
      val body = try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.commons.io.IOUtils.copy(in, bos)
        new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
      try return parseManifest(body)
      catch {
        case e: Exception if attempt < 50 =>
          attempt += 1
          Thread.sleep(20)
        case e: Exception =>
          throw new IllegalStateException(
            s"manifest v$v at $dir stayed unparsable — truncated commit?", e)
      }
    }
    sys.error("unreachable")
  }

  /** Parse a manifest body (also used by the change-feed tail, which
    * receives manifests through a file stream, not this reader). */
  def parseManifest(body: String): Snapshot = {
    val v = """"version"\s*:\s*(\d+)""".r
      .findFirstMatchIn(body).get.group(1).toInt
    val compaction = """"compaction"\s*:\s*true""".r
      .findFirstIn(body).isDefined
    val txn = """"txn"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(body).map(_.group(1))
    val schemaDdl = """"schema"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(body).map(_.group(1))
    // one {"path":...,"rows":N[,"lo":L,"hi":H]} per line after the header
    val entries = body.linesIterator
      .filter(_.contains("\"path\""))
      .map { line =>
        val p = """"path"\s*:\s*"([^"]+)"""".r
          .findFirstMatchIn(line).get.group(1)
        val r = """"rows"\s*:\s*(\d+)""".r
          .findFirstMatchIn(line).get.group(1).toLong
        val lo = """"lo"\s*:\s*(-?\d+)""".r
          .findFirstMatchIn(line).map(_.group(1).toLong)
        val hi = """"hi"\s*:\s*(-?\d+)""".r
          .findFirstMatchIn(line).map(_.group(1).toLong)
        ManifestEntry(p, r, lo, hi)
      }.toVector
    Snapshot(v, entries, compaction, txn, schemaDdl)
  }

  /** Read the table at a snapshot — only that version's files, never
    * a directory listing. */
  def read(spark: SparkSession, dir: String,
      asOf: Option[Int] = None): DataFrame = {
    val snap = snapshot(spark, dir, asOf)
    if (snap.paths.isEmpty)
      // empty version: preserve schema from any prior version's files
      // is impossible without files; callers create tables non-empty
      sys.error(s"version ${snap.version} of $dir lists no files")
    snap.schemaDdl match {
      // schema-on-log: files written before a column existed read
      // back with that column null, and the column ORDER is the
      // log's, not any footer's
      case Some(ddl) => spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .parquet(snap.paths: _*)
      case None => spark.read.parquet(snap.paths: _*)
    }
  }

  /** Append with SCHEMA EVOLUTION: columns of `df` not yet in the
    * table are added to the log schema (types of shared columns must
    * match — silent coercion is how tables rot); rows already on disk
    * read back with the new columns null. The evolved schema rides
    * the same atomic commit as the files. */
  def appendEvolve(spark: SparkSession, dir: String, df: DataFrame,
      statsCol: Option[String] = None): Int = {
    import org.apache.spark.sql.types.StructType
    val cur = snapshot(spark, dir)
    val base = cur.schemaDdl.map(StructType.fromDDL)
      .getOrElse(spark.read.parquet(cur.paths: _*).schema)
    df.schema.fields.foreach { f0 =>
      base.fields.find(_.name == f0.name).foreach { have =>
        require(have.dataType == f0.dataType,
          s"appendEvolve: column ${f0.name} is ${have.dataType.sql} " +
            s"in the log but ${f0.dataType.sql} in the append — " +
            "evolution adds columns, it never coerces them")
      }
    }
    val evolved = StructType(base.fields ++
      df.schema.fields.filterNot(f0 => base.fieldNames.contains(f0.name)))
    val newEntries = writeFiles(spark, dir, df, statsCol)
    var committed: Option[Int] = None
    var guard = 0
    while (committed.isEmpty && guard < 50) {
      val c = snapshot(spark, dir)
      committed = tryCommit(spark, dir, c.version + 1,
        c.entries ++ newEntries, schemaDdl = Some(evolved.toDDL))
      guard += 1
    }
    committed.getOrElse(sys.error(s"appendEvolve lost 50 races at $dir"))
  }

  /** The atomic commit: create-if-absent of the next version's
    * manifest. Returns the committed version, or None if another
    * writer won the race (caller re-reads latest and retries). */
  private def tryCommit(spark: SparkSession, dir: String, version: Int,
      entries: Vector[ManifestEntry],
      compaction: Boolean = false,
      txn: Option[String] = None,
      schemaDdl: Option[String] = None): Option[Int] = {
    val f = fs(spark, dir)
    f.mkdirs(manifestDir(dir))
    val target = new Path(manifestDir(dir), manifestName(version))
    val txnField = txn.map(t => s""", "txn": "$t"""").getOrElse("") +
      schemaDdl.map(d => s""", "schema": "$d"""").getOrElse("")
    val body =
      s"""{"version": $version, "compaction": $compaction$txnField, "files": [""" +
        "\n" +
      entries.map { e =>
        val stats = (e.lo, e.hi) match {
          case (Some(l), Some(h)) => s""", "lo": $l, "hi": $h"""
          case _ => ""
        }
        s"""  {"path": "${e.path}", "rows": ${e.rows}$stats}"""
      }.mkString(",\n") + "\n]}"
    try {
      val out = f.create(target, /* overwrite = */ false)
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      Some(version)
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
      case _: java.io.IOException if f.exists(target) => None
    }
  }

  /** Write `df` as new immutable data files and return their entries:
    * ONE read-back grouped by input_file_name yields every file's row
    * count and (when `statsCol` is set) its min/max — the per-file
    * statistics pass every table format's writer performs. */
  private def writeFiles(spark: SparkSession, dir: String,
      df: DataFrame, statsCol: Option[String]): Vector[ManifestEntry] = {
    import org.apache.spark.sql.functions._
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val sub = new Path(dir, s"data-$stamp").toString
    df.write.mode("errorifexists").parquet(sub)
    val back = spark.read.parquet(sub)
    val aggs = count(lit(1)).as("n") +: statsCol.toSeq.flatMap(c => Seq(
      min(col(c).cast("long")).as("slo"), max(col(c).cast("long")).as("shi")))
    val byFile = back.groupBy(input_file_name().as("pf"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    byFile.toVector.map { r =>
      ManifestEntry(
        // input_file_name is URI-encoded; normalize to the Path form
        // listStatus would give
        new Path(new java.net.URI(r.getString(0))).toString,
        r.getLong(1),
        if (statsCol.isDefined) Some(r.getLong(2)) else None,
        if (statsCol.isDefined) Some(r.getLong(3)) else None)
    }.sortBy(_.path)
  }

  /** Initialize a table at version 1 (fails if already initialized). */
  def create(spark: SparkSession, dir: String, df: DataFrame,
      statsCol: Option[String] = None): Int = {
    require(versions(spark, dir).isEmpty, s"table already exists at $dir")
    val entries = writeFiles(spark, dir, df, statsCol)
    tryCommit(spark, dir, 1, entries)
      .getOrElse(sys.error(s"concurrent create at $dir"))
  }

  /** Append `df` as a new version (retries past concurrent commits —
    * an append conflicts with nothing: it only adds files). With
    * `txn` set, the append is IDEMPOTENT: if any kept manifest
    * already carries the marker, nothing is written and that version
    * is returned — the exactly-once contract a streaming sink's
    * (queryId, batchId) redelivery needs (Delta's txn action; the
    * dedupe window is the kept manifests, so vacuum retention must
    * exceed the redelivery horizon). */
  def append(spark: SparkSession, dir: String, df: DataFrame,
      statsCol: Option[String] = None,
      txn: Option[String] = None): Int = {
    txn.flatMap(t => txnVersion(spark, dir, t)) match {
      case Some(v) => return v
      case None =>
    }
    val newEntries = writeFiles(spark, dir, df, statsCol)
    var committed: Option[Int] = None
    var guard = 0
    while (committed.isEmpty && guard < 50) {
      // the marker may have landed while we were writing files (a
      // concurrent retry of the same batch): re-check before commit
      txn.flatMap(t => txnVersion(spark, dir, t)) match {
        case Some(v) => return v
        case None =>
      }
      // appending to an uninitialized table bootstraps v1 — the shape
      // a streaming sink needs (its first batch IS the create)
      val cur =
        if (versions(spark, dir).isEmpty) Snapshot(0, Vector.empty)
        else snapshot(spark, dir)
      committed = tryCommit(spark, dir, cur.version + 1,
        cur.entries ++ newEntries, txn = txn, schemaDdl = cur.schemaDdl)
      guard += 1
    }
    committed.getOrElse(sys.error(s"append lost 50 commit races at $dir"))
  }

  /** The version that committed `txn`, if present in a kept manifest. */
  def txnVersion(spark: SparkSession, dir: String,
      txn: String): Option[Int] =
    versions(spark, dir).reverse
      .find(v => snapshot(spark, dir, Some(v)).txn.contains(txn))

  /** Replace the file set wholesale (overwrite semantics). */
  def overwrite(spark: SparkSession, dir: String, df: DataFrame,
      statsCol: Option[String] = None): Int = {
    val newEntries = writeFiles(spark, dir, df, statsCol)
    val cur = snapshot(spark, dir)
    tryCommit(spark, dir, cur.version + 1, newEntries)
      .getOrElse(sys.error(s"concurrent commit at $dir — overwrite " +
        "is not auto-retried: rebase on the new version first"))
  }

  /** Manifest-level data skipping: read only the files whose [lo, hi]
    * stats range intersects [from, to] — file pruning decided from
    * the MANIFEST alone, no footer opened for a skipped file (the
    * Delta/Iceberg stats-pruning read path). Files without stats are
    * conservatively read. Returns the frame (residual predicate still
    * applied, so results are exact even with stale/absent stats) plus
    * (files read, files total). */
  def readRange(spark: SparkSession, dir: String, statsCol: String,
      from: Long, to: Long, asOf: Option[Int] = None)
      : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions._
    val snap = snapshot(spark, dir, asOf)
    val live = snap.entries.filter(e => (e.lo, e.hi) match {
      case (Some(l), Some(h)) => h >= from && l <= to
      case _ => true
    })
    val df =
      (if (live.isEmpty) read(spark, dir, asOf).limit(0)
       else spark.read.parquet(live.map(_.path): _*))
        .filter(col(statsCol).cast("long").between(from, to))
    (df, live.size, snap.entries.size)
  }

  /** Transactional COW DML (Delta's MERGE shape): read the current
    * snapshot, apply `transform` to it, write the result as new
    * immutable files, and commit them as the next version — the
    * commit is CONDITIONAL on the version read (create-if-absent of
    * version+1), so a concurrent commit in the read-transform window
    * loses nothing: the loser re-reads the NEW snapshot, re-applies
    * the transform, and retries. Orphaned files from lost races are
    * unreachable and vacuumable. Old versions stay readable (a MERGE
    * is just another version — time travel shows pre-merge state). */
  def mergeCommit(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame,
      statsCol: Option[String] = None): Int = {
    var guard = 0
    while (guard < 10) {
      val cur = snapshot(spark, dir)
      val merged = transform(read(spark, dir, Some(cur.version)))
      val entries = writeFiles(spark, dir, merged, statsCol)
      tryCommit(spark, dir, cur.version + 1, entries,
        schemaDdl = cur.schemaDdl.map(_ => merged.schema.toDDL)) match {
        case Some(v) => return v
        case None => guard += 1 // raced: re-read, re-apply, retry
      }
    }
    sys.error(s"mergeCommit lost 10 commit races at $dir")
  }

  /** Manifest-committed compaction: bin-pack the CURRENT version's
    * files ([[Compaction.planBins]]), rewrite each multi-file bin to
    * one new immutable file, and commit the new file set as the next
    * version. Old versions keep reading the old files — this is what
    * makes OPTIMIZE safe under concurrent readers, the piece x36's
    * bare-directory swap could not give. Row counts verified per bin
    * before the commit; a crash leaves orphan files, never a corrupt
    * version. */
  def compactCommit(spark: SparkSession, dir: String,
      targetBytes: Long): Int = {
    val f = fs(spark, dir)
    val cur = snapshot(spark, dir)
    val sized = cur.entries.map(e =>
      Compaction.FileInfo(e.path, f.getFileStatus(new Path(e.path)).getLen))
    val bins = Compaction.planBins(sized, targetBytes)
    // bins can mix files written before and after a schema evolution:
    // the rewrite must read with the LOG schema so the merged file
    // carries every column (missing ones as nulls), not a footer's
    // truncated view
    def binRead(paths: Seq[String]) = cur.schemaDdl match {
      case Some(ddl) => spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
    val rewritten = bins.filter(_.files.size >= 2).flatMap { bin =>
      val inPaths = bin.files.map(_.path)
      val inRows = cur.entries.filter(e => inPaths.contains(e.path))
        .map(_.rows).sum
      val stamp = java.util.UUID.randomUUID().toString.take(8)
      val sub = new Path(dir, s"compact-$stamp").toString
      binRead(inPaths).coalesce(1)
        .write.mode("errorifexists").parquet(sub)
      val part = f.listStatus(new Path(sub)).toVector.map(_.getPath)
        .find(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"compact bin ${bin.binId}: no part file"))
      val outRows = spark.read.parquet(part.toString).count()
      require(outRows == inRows,
        s"compact bin ${bin.binId} would lose rows: $inRows -> $outRows")
      // merged file stats fold from the members' — no data re-read
      val mlo = bin.files.flatMap(f0 =>
        cur.entries.find(_.path == f0.path).flatMap(_.lo))
      val mhi = bin.files.flatMap(f0 =>
        cur.entries.find(_.path == f0.path).flatMap(_.hi))
      Vector(inPaths.toSet -> ManifestEntry(part.toString, outRows,
        if (mlo.size == bin.files.size) Some(mlo.min) else None,
        if (mhi.size == bin.files.size) Some(mhi.max) else None))
    }
    val replaced = rewritten.flatMap(_._1).toSet
    val entries = cur.entries.filterNot(e => replaced.contains(e.path)) ++
      rewritten.map(_._2)
    tryCommit(spark, dir, cur.version + 1, entries.sortBy(_.path),
      compaction = true, schemaDdl = cur.schemaDdl)
      .getOrElse(sys.error(s"concurrent commit at $dir during compact"))
  }

  /** Delete data files unreachable from the kept (newest `keep`)
    * manifests, and the dropped manifests themselves. Never touches a
    * file a kept version lists. */
  def vacuum(spark: SparkSession, dir: String, keep: Int): Unit = {
    require(keep >= 1, "must keep at least the latest version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop, kept) = vs.splitAt(math.max(0, vs.size - keep))
    val reachable = kept
      .flatMap(v => snapshot(spark, dir, Some(v)).paths).toSet
    val dataDirs = f.listStatus(new Path(dir)).toVector
      .filter(st => st.isDirectory && st.getPath.getName != "_manifests")
    dataDirs.foreach { d =>
      f.listStatus(d.getPath).toVector.map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") &&
          !reachable.contains(p.toString))
        .foreach(p => f.delete(p, false))
    }
    drop.foreach(v =>
      f.delete(new Path(manifestDir(dir), manifestName(v)), false))
  }
}
