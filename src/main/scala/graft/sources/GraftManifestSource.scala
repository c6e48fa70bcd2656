package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.sources.{DataSourceRegister, InsertableRelation}
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.{DvStore, ManifestTable}

/** DSv2 front door for the versioned-manifest table format:
  *
  * {{{
  *   spark.read.format("graft-manifest").load(dir)                      // latest
  *   spark.read.format("graft-manifest").option("versionAsOf", 2)      // time travel
  *     .load(dir)
  *   spark.read.format("graft-manifest")
  *     .option("timestampAsOf", "2026-08-15 12:00:00").load(dir)
  *   spark.read.format("graft-manifest")
  *     .option("changesFromVersion", 1).load(dir)                       // change feed
  * }}}
  *
  * The Spark-first shape: the table's `newScanBuilder` returns Spark's
  * OWN [[ParquetScanBuilder]] over a custom [[ManifestFileIndex]] —
  * so column pruning, filter pushdown to parquet (row-group/footer
  * skipping), vectorized reads and whole-stage codegen are all the
  * native parquet path, while the FILE LIST comes from the resolved
  * manifest (never a directory listing) and manifest-level stats
  * pruning happens in `FileIndex.listFiles`, exactly where Delta's
  * TahoeFileIndex does it: a pushed range predicate on the table's
  * stats column drops files from planning before any footer is
  * opened.
  *
  * Version resolution happens ONCE, when the table is created — the
  * returned DataFrame is plan-pinned to that snapshot's files
  * (snapshot isolation: commits after planning are invisible, the
  * property x37 proves through the Scala API).
  */
class GraftManifestSource extends TableProvider with DataSourceRegister
  with org.apache.spark.sql.sources.StreamSinkProvider {

  override def shortName(): String = "graft-manifest"
  override def supportsExternalMetadata(): Boolean = true

  /** `writeStream.format("graft-manifest")` — st46's exactly-once
    * contract through the front door: every micro-batch appends as
    * ONE manifest commit stamped with a txn marker keyed by
    * (checkpointLocation, batchId), so batch REDELIVERY (restart
    * after a crash between sink write and offset commit — the window
    * every at-least-once sink re-executes) is a log-level no-op that
    * survives driver restarts. The first batch bootstraps the table
    * (its append IS the create). Implements Spark's V1 streaming sink
    * hook — the driver-side DataFrame lands through the same
    * optimistic commit path as every other writer of the log. */
  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-manifest tables do not support partition columns")
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-manifest streaming sink supports Append output only, got " +
        s"$outputMode — Complete/Update rewrite history, a log appends")
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-manifest sink requires a path"))
    // the checkpoint identifies the QUERY across restarts — exactly
    // the scope a redelivered batchId must dedupe within
    val ckpt = parameters.getOrElse("checkpointLocation", dir)
    new org.apache.spark.sql.execution.streaming.Sink {
      override def name(): String = s"graft-manifest-sink $dir"
      override def addBatch(batchId: Long,
          data: org.apache.spark.sql.DataFrame): Unit = {
        // the incoming frame is the micro-batch's STREAMING plan
        // slice (df.write/.rdd refuse it); rebase through the
        // PHYSICAL rows — queryExecution.toRdd + a bound row
        // deserializer per partition — so the write stays DISTRIBUTED
        // (executors write the parquet files; only the manifest
        // commit is driver-side). Same rebase every v1 streaming
        // connector performs.
        val s = data.sparkSession
        val schema = data.schema
        val rowRdd = data.queryExecution.toRdd.mapPartitions { it =>
          val deser = org.apache.spark.sql.catalyst.encoders
            .ExpressionEncoder(schema).resolveAndBind()
            .createDeserializer()
          it.map(deser)
        }
        val batch = s.createDataFrame(rowRdd, schema)
        ManifestTable.append(s, dir, batch,
          txn = Some(s"stream:$ckpt:$batchId"))
      }
    }
  }

  private def tableDir(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path"))
    require(p.isDefined,
      "graft-manifest requires a path: spark.read.format(\"graft-manifest\").load(dir)")
    p.get
  }

  /** Resolve (snapshot, file entries) from the read options. A table
    * with no log yet resolves to the VERSION-0 placeholder — the
    * write paths bootstrap it (a streaming sink's first batch IS the
    * create; Spark probes getTable before checking capabilities), and
    * the read path errors loudly at scan time instead. */
  private def resolveEntries(options: CaseInsensitiveStringMap)
      : (ManifestTable.Snapshot, Vector[ManifestTable.ManifestEntry]) = {
    val spark = SparkSession.active
    val dir = tableDir(options)
    if (ManifestTable.versions(spark, dir).isEmpty)
      return (ManifestTable.Snapshot(0, Vector.empty), Vector.empty)
    val vAsOf = Option(options.get("versionAsOf")).map(_.toInt)
    val tAsOf = Option(options.get("timestampAsOf"))
    require(vAsOf.isEmpty || tAsOf.isEmpty,
      "specify at most one of versionAsOf / timestampAsOf")
    val version = tAsOf match {
      case Some(ts) => Some(ManifestTable.versionAt(spark, dir,
        java.sql.Timestamp.valueOf(ts).getTime))
      case None => vAsOf
    }
    val snap = ManifestTable.snapshot(spark, dir, version)
    val entries = Option(options.get("changesFromVersion")) match {
      case None => snap.entries
      case Some(fromV) =>
        ManifestTable.changedEntries(spark, dir, fromV.toInt, snap.version)
    }
    (snap, entries)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (snap, entries) = resolveEntries(options)
    val base = snap.schemaDdl match {
      case Some(ddl) => StructType.fromDDL(ddl)
      case None if snap.version == 0 => new StructType() // not created yet
      case None => SparkSession.active.read
        .parquet(entries.map(_.path): _*).schema
    }
    if (options.getBoolean("readChangeFeed", false))
      base.add("_change_type", org.apache.spark.sql.types.StringType)
        .add("_commit_version", IntegerType)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (snap, entries) = resolveEntries(options)
    if (options.getBoolean("readChangeFeed", false)) {
      // the CHANGE-DATA-FEED face (Delta's readChangeFeed): batch and
      // streaming reads of the row-level feed, planned from log actions
      val logical = snap.schemaDdl match {
        case Some(ddl) => StructType.fromDDL(ddl)
        case None => sys.error(
          s"readChangeFeed needs a log schema at ${tableDir(options)} — " +
            "the table has not been created")
      }
      return new GraftCdfTable(tableDir(options), logical, snap.colMap)
    }
    new GraftManifestTable(tableDir(options), snap.version, schema,
      entries, snap.statsCol, snap.colMap, snap.checks,
      snap.partCols, snap.hiveDirs)
  }
}

class GraftManifestTable(dir: String, version: Int, dataSchema: StructType,
    entries: Vector[ManifestTable.ManifestEntry], statsCol: Option[String],
    colMap: Map[String, String] = Map.empty,
    checks: Map[String, String] = Map.empty,
    partCols: Seq[String] = Nil,
    hiveDirs: Boolean = false)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  private def mapped: Boolean = colMap.exists { case (l, p) => l != p }

  /** The log's CHECK constraints surfaced through DSv2 (Spark 4's
    * table-constraint API) — DESCRIBE shows them, and Spark's own
    * ResolveTableConstraints can validate V2 writes against them; the
    * engine's write paths enforce them regardless of entry door. */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    checks.toArray.sortBy(_._1).map { case (n, p) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check(n).predicateSql(p).build()
        : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }

  /** SQL UPDATE / MERGE INTO / non-translatable DELETE — Spark's
    * row-level-operation rewrite (RewriteUpdateTable & co.) against a
    * COPY-ON-WRITE group whose granularity is the scanned snapshot:
    * the operation's scan reads the pinned file set, Spark computes
    * the full replacement rows (updated + untouched), the EXECUTORS
    * write them through Spark's own native parquet BatchWrite into a
    * staging directory, and the driver adopts staging + removes the
    * pinned files in ONE atomic manifest commit
    * ([[ManifestTable.replaceCommit]] — concurrent appends absorbed,
    * concurrent rewrites of a pinned file abort as a write conflict).
    * Translatable DELETEs still take the cheaper SupportsDelete path
    * (Spark's OptimizeMetadataOnlyDeleteFromTable converts back). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => {
      require(!hiveDirs,
        s"DML on hive-converted table $dir: the files do not store " +
          "the partition columns — compact (OPTIMIZE) first to " +
          "materialize them, then UPDATE/MERGE/DELETE work")
      new GraftRowLevelOperation(dir, dataSchema, entries, statsCol,
        info.command, colMap)
    }

  import GraftManifestTable.filterToColumn

  /** SQL `DELETE FROM t WHERE …` — copy-on-write through the SAME
    * conditional commit as MERGE (`ManifestTable.mergeCommit`): the
    * surviving rows are rewritten as new immutable files and committed
    * against the version read; a raced concurrent commit re-reads and
    * re-applies, and time travel to the pre-delete version is the undo
    * log. Only predicates expressible as v1 Filters reach this path
    * (Spark refuses the rest at analysis — correct for COW: an
    * untranslatable predicate would silently fall back to a full
    * rewrite the user didn't ask for). */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f => filterToColumn(f).isDefined)

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val spark = SparkSession.active
    val doomed = filters.flatMap(filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    // DELETE removes rows where the predicate is TRUE; a NULL
    // predicate row SURVIVES (three-valued logic — `!doomed` alone
    // would silently delete every NULL-valued row)
    val survives = org.apache.spark.sql.functions
      .not(org.apache.spark.sql.functions.coalesce(doomed,
        org.apache.spark.sql.functions.lit(false)))
    ManifestTable.mergeCommit(spark, dir,
      cur => cur.filter(survives), statsCol,
      // write-time CDC when the TABLE opted in (Delta's
      // enableChangeDataFeed): the feed then shows exactly the
      // deleted rows, not a whole-file re-insert of the survivors;
      // without the opt-in the capture diff is skipped — a table
      // that never reads its feed should not pay for it
      cdcLabels =
        if (ManifestTable.snapshot(spark, dir).cdcOn)
          Some(("delete", "insert"))
        else None)
  }

  override def name(): String = s"graft-manifest $dir@v$version"
  override def schema(): StructType = dataSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // the version-0 placeholder exists only so WRITE paths can
    // bootstrap; reading a table that was never created stays an error
    if (version == 0 && entries.isEmpty && dataSchema.isEmpty)
      sys.error(s"no manifest at $dir — the table has not been created")
    val spark = SparkSession.active
    // deletion-vector snapshots read MERGE-ON-READ through the front
    // door too: clean files keep the full native scan, DV-carrying
    // files go through a position-skipping reader (see
    // [[DvManifestScanBuilder]]) — a SQL user never needs purge_dvs
    // just to SELECT
    // hive-converted layout: the files do not store the partition
    // columns — plan per file and fill values from the log's tuples
    if (hiveDirs)
      return new HiveManifestScanBuilder(spark, dir, entries, statsCol,
        dataSchema, partCols)
    if (entries.exists(_.dv.isDefined))
      return new DvManifestScanBuilder(spark, dir, entries, statsCol,
        dataSchema, colMap, options)
    // column-mapped snapshot: the files store PHYSICAL names, so the
    // parquet scan runs in physical space and the Scan reports the
    // logical names back (rows are positional — same types, same
    // order, zero copies)
    if (mapped)
      return new MappedManifestScanBuilder(spark, entries, dataSchema,
        colMap)
    val index = new ManifestFileIndex(spark, entries, statsCol,
      Some(dataSchema))
    // schema == dataSchema: manifest tables carry no partition columns.
    // The wrapper forwards pushdown to Spark's own ParquetScanBuilder
    // (so batch reads keep native pruning) and adds the streaming face.
    new ManifestScanBuilder(
      ParquetScanBuilder(spark, index, dataSchema, dataSchema, options),
      dir, dataSchema, options)
  }

  /** INSERT INTO / INSERT OVERWRITE / df.write.format(...): the V1
    * write bridge — the driver-side DataFrame lands through the SAME
    * transactional commit path as the Scala API (append's optimistic
    * retry; overwrite's file-set replacement + schema reset), so SQL
    * writers and engine writers share one concurrency story. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                overwrite: Boolean): Unit = {
              val s = data.sparkSession
              if (doTruncate || overwrite) {
                // INSERT OVERWRITE replaces content, not layout: a
                // partitioned table stays partitioned through SQL
                val pc =
                  if (ManifestTable.versions(s, dir).isEmpty) Nil
                  else ManifestTable.snapshot(s, dir).partCols
                ManifestTable.overwrite(s, dir, data, statsCol, pc)
              } else ManifestTable.append(s, dir, data, statsCol)
            }
          }
      }
    }
}

/** The COPY-ON-WRITE row-level operation behind SQL UPDATE / MERGE
  * INTO / rewritten DELETE: scan = the pinned snapshot through the
  * same [[ManifestScanBuilder]] as every read (manifest-stats and
  * partition pruning included); write = Spark's OWN ParquetWrite into
  * a fresh staging directory — executors write through the native
  * vectorized parquet path, the driver's only work is the atomic
  * manifest commit that swaps pinned files for staged ones. */
class GraftRowLevelOperation(dir: String, dataSchema: StructType,
    entries: Vector[ManifestTable.ManifestEntry],
    statsCol: Option[String],
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    colMap: Map[String, String] = Map.empty)
  extends org.apache.spark.sql.connector.write.RowLevelOperation {

  private def mapped: Boolean = colMap.exists { case (l, p) => l != p }
  /** The logical schema with stored (physical) field names. */
  private def physSchema: StructType =
    ManifestTable.physicalSchema(dataSchema, colMap)

  /** The manifest entries the COW scan actually planned — these ARE
    * the groups being replaced, so the commit removes exactly them
    * (and aborts if any entry's deletion vector was re-pointed by a
    * concurrent MOR delete in the meantime). Written by the scan
    * builder at build time, read by the write at commit time (scan
    * building always precedes write execution). Defaults to the full
    * pinned snapshot (no group filter pushed = everything
    * rewritten). */
  @volatile private[sources] var scannedEntries
      : Vector[ManifestTable.ManifestEntry] = entries

  override def command()
      : org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  /** The COW scan. Two contracts differ from a plain read:
    *
    *   - pushed filters are GROUP filters: they may drop whole FILES
    *     (manifest stats / partition tuples — both file-exact
    *     decisions), but must NEVER reach the parquet reader — a
    *     row-group skip inside a kept file would silently drop the
    *     carry-over rows the rewrite must copy forward. Every filter
    *     is therefore reported back as residual and the reader scans
    *     kept files IN FULL (Iceberg's SparkCopyOnWriteScan makes the
    *     same choice);
    *   - the planned file set is recorded on the operation, because
    *     the write's commit must remove exactly those files. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val op = this
    new ScanBuilder with SupportsPushDownCatalystFilters {
      private var groupFilters: Seq[Expression] = Nil
      override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
        groupFilters = filters
        filters // ALL residual: rows are filtered by the rewrite's
                // own projection, never by the reader
      }
      override def pushedFilters: Array[Predicate] = Array.empty
      override def build(): Scan = {
        val spark = SparkSession.active
        // group-filter pruning runs in LOGICAL space (the recorded
        // stats/partition keys are logical), so mapped tables prune
        // the same way unmapped ones do
        val kept = ManifestFileIndex.pruneEntries(entries, statsCol,
          groupFilters)
        op.scannedEntries = kept
        val (dirtyK, cleanK) = kept.partition(_.dv.isDefined)
        // the COW scan of a MAPPED table reads the files' stored
        // (physical) names and reports the logical ones — rows are
        // positional, so the rewrite pipeline never notices
        def bare(es: Vector[ManifestTable.ManifestEntry]) =
          ParquetScanBuilder(spark,
            new ManifestFileIndex(spark, es, None, Some(physSchema)),
            physSchema, physSchema, CaseInsensitiveStringMap.empty())
        def logicalFace(is: Scan): Scan =
          if (!mapped) is
          else new Scan {
            override def readSchema(): StructType = dataSchema
            override def description(): String =
              is.description() + " (column-mapped cow)"
            override def toBatch: Batch = is.toBatch
          }
        if (dirtyK.isEmpty) logicalFace(bare(cleanK).build())
        else
          // DML on a MOR table: the COW scan applies the deletion
          // vectors, so the rewrite copies forward LIVE rows only and
          // the commit (which removes the dv-carrying entries) leaves
          // the vectors superseded for vacuum. The commit-time
          // (dv, dvRows) conflict check aborts if a concurrent MOR
          // delete re-points a pinned file mid-flight. Mapped tables
          // scan physically like the clean branch; logicalFace
          // reports the analyzer's names (rows positional).
          logicalFace(new ManifestDvScan(
            bare(cleanK).build(), bare(dirtyK).build(),
            ManifestTable.baseUriPath(spark, dir),
            ManifestTable.dvPathsByKey(spark, dir, dirtyK),
            new DvStore.SerializableConf(spark.sessionState.newHadoopConf()),
            dir, dataSchema, CaseInsensitiveStringMap.empty()))
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        import org.apache.spark.sql.connector.write.RowLevelOperation.Command
        // the command names the feed labels: a COW DELETE's preimages
        // ARE deletes; UPDATE/MERGE diffs are before/after images
        // (MERGE-inserted rows surface as postimages)
        val labels = cmd match {
          case Command.DELETE => ("delete", "insert")
          case _ => ("update_preimage", "update_postimage")
        }
        // mapped table: stage the replacement files under the STORED
        // (physical) names — the parquet writer takes its field names
        // from the write schema, and rows are positional either way
        val writeInfo: LogicalWriteInfo =
          if (!mapped) info
          else new LogicalWriteInfo {
            override def queryId(): String = info.queryId()
            override def schema(): StructType =
              ManifestTable.physicalSchema(info.schema(), colMap)
            override def options()
                : org.apache.spark.sql.util.CaseInsensitiveStringMap =
              info.options()
          }
        new GraftReplaceDataWrite(dir, () => scannedEntries, writeInfo,
          labels)
      }
    }
}

/** The REPLACE DATA write: delegates the data movement to Spark's
  * native parquet [[org.apache.spark.sql.execution.datasources.v2.FileWrite]]
  * (executors write the files, the file-commit protocol finalizes
  * them), then commits the swap to the manifest log in
  * `BatchWrite.commit` — the same two-layer split every production
  * table format uses: bytes through the format's writer, atomicity
  * through the log. */
class GraftReplaceDataWrite(dir: String,
    replaced: () => Vector[ManifestTable.ManifestEntry],
    info: LogicalWriteInfo,
    cdcLabels: (String, String) =
      ("update_preimage", "update_postimage")) extends Write {

  private val staging = new Path(dir,
    s"data-${java.util.UUID.randomUUID().toString.take(8)}").toString

  private val inner: Write =
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetWrite(
      Seq(staging), "parquet", _ => true, info)

  override def description(): String = s"graft-manifest replace-data $dir"

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new org.apache.spark.sql.connector.write.BatchWrite {
      private val ib = inner.toBatch
      override def createBatchWriterFactory(
          pi: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.DataWriterFactory =
        // ReplaceData's query PREPENDS a __row_operation bookkeeping
        // column; Spark only strips it (ReplaceDataProjections'
        // rowProjection) when the operation also declares metadata
        // attributes — with none, ReplaceDataExec falls back to the
        // plain writing task and hands the writer the raw rows. The
        // factory wrapper applies the same leading-columns strip the
        // rowProjection would: project the TRAILING schema-width
        // ordinals (a width match passes rows through untouched).
        new GraftStripLeadingWriterFactory(
          ib.createBatchWriterFactory(pi), info.schema())
      override def useCommitCoordinator(): Boolean = ib.useCommitCoordinator()
      override def onDataWriterCommit(
          m: org.apache.spark.sql.connector.write.WriterCommitMessage): Unit =
        ib.onDataWriterCommit(m)
      override def commit(
          ms: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
          : Unit = {
        ib.commit(ms) // finalize the staged parquet files
        ManifestTable.replaceCommit(SparkSession.active, dir, staging,
          replaced(), cdcLabels)
      }
      override def abort(
          ms: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
          : Unit = {
        ib.abort(ms)
        // staged files never entered the log; sweep the directory
        val f = new Path(staging).getFileSystem(
          SparkSession.active.sparkContext.hadoopConfiguration)
        f.delete(new Path(staging), true)
      }
    }
}

/** Executor-side projection for the REPLACE DATA write: rows wider
  * than the write schema carry ReplaceData's prepended
  * `__row_operation` bookkeeping column — keep the trailing
  * `schema.size` fields (the data columns, in schema order).
  *
  * The assumed shape is VALIDATED, not trusted: exactly ONE extra
  * field, and on every projected row field 0 must hold one of
  * [[org.apache.spark.sql.catalyst.util.RowDeltaUtils]]'s operation
  * sentinels (DELETE=1 … WRITE_WITH_METADATA=6). If a Spark release
  * ever APPENDS the column, reorders ReplaceData's output, or adds a
  * second bookkeeping column, field 0 is a data value (or the width
  * is off) and the write fails loudly instead of silently persisting
  * the wrong columns as data. Serializable: ships to executors inside
  * the writer factory. */
class GraftStripLeadingWriterFactory(
    inner: org.apache.spark.sql.connector.write.DataWriterFactory,
    schema: StructType)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    new org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] {
      import org.apache.spark.sql.catalyst.util.RowDeltaUtils
      private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _
      override def write(r: org.apache.spark.sql.catalyst.InternalRow): Unit =
        if (r.numFields == schema.size) w.write(r)
        else {
          require(r.numFields == schema.size + 1,
            s"replace-data rows carry ${r.numFields} fields for a " +
              s"${schema.size}-column schema — expected exactly one " +
              "prepended __row_operation column; Spark's ReplaceData " +
              "output shape changed, refusing to guess a projection")
          val op = r.getInt(0)
          require(op >= RowDeltaUtils.DELETE_OPERATION &&
            op <= RowDeltaUtils.WRITE_WITH_METADATA_OPERATION,
            s"replace-data row field 0 holds $op, not a RowDeltaUtils " +
              "operation sentinel — the bookkeeping column is no longer " +
              "leading; refusing to project data columns blindly")
          if (proj == null) proj = org.apache.spark.sql.catalyst
            .ProjectingInternalRow(schema, 1 to schema.size)
          proj.project(r)
          w.write(proj)
        }
      override def commit(): org.apache.spark.sql.connector.write
        .WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
  }
}

/** A [[org.apache.spark.sql.execution.datasources.FileIndex]] whose
  * file list IS the manifest (the roots are the snapshot's data
  * files, never a directory), and whose `listFiles` applies
  * MANIFEST-LEVEL stats pruning: a conjunction of pushed range
  * predicates on the table's stats column intersects against each
  * entry's [lo, hi] and drops non-overlapping files from planning.
  * Files without stats are conservatively kept, and Spark always
  * re-applies the predicate to the rows that are read — pruning can
  * only skip work, never change results. */
class ManifestFileIndex(spark: SparkSession,
    entries: Vector[ManifestTable.ManifestEntry],
    statsCol: Option[String],
    userSchema: Option[StructType])
  extends InMemoryFileIndex(spark, entries.map(e => new Path(e.path)),
    Map.empty[String, String], userSchema) {

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val kept = ManifestFileIndex.pruneEntries(entries, statsCol, dataFilters)
    if (kept.size == entries.size) return base
    // keyed by scheme-less URI path: the manifest records Path-form
    // strings, the listing yields qualified statuses — both normalize
    // to the same posix path
    val keep = kept.map(e => new Path(e.path).toUri.getPath).toSet
    base.map(pd => pd.copy(files =
      pd.files.filter(f => keep.contains(f.getPath.toUri.getPath))))
  }
}

object ManifestFileIndex {

  /** FILE-LEVEL pruning of manifest entries against pushed conjuncts:
    * range windows per stats column ([lo, hi] intersection —
    * conservative: a file without stats for a constrained column is
    * kept) and allowed-value sets per partition column (EXACT: a file
    * holds one tuple). Shared by the read path's `listFiles` and the
    * COW row-level scan's group pruning — both must drop only files
    * that provably contain NO matching row. */
  def pruneEntries(entries: Vector[ManifestTable.ManifestEntry],
      statsCol: Option[String],
      filters: Seq[Expression]): Vector[ManifestTable.ManifestEntry] = {
    if (filters.isEmpty) return entries
    val statCols: Set[String] =
      entries.iterator.flatMap(_.stats.keysIterator).toSet
    val partColNames: Set[String] =
      entries.iterator.flatMap(_.part.keysIterator).toSet
    // [lb, ub] window per constrained stats column (legacy single
    // stats_col + every multi-stats column any entry carries), kept
    // SEPARATE by the space the bounds live in: rangeOf folds
    // integral literals (numeric space — stats recorded via
    // cast('long')), stringRangeOf folds string literals into the
    // 8-byte-prefix ENCODED space. A resolved plan constrains a
    // column with literals of its own type (a cross-type spelling
    // wraps the attribute in a Cast, which the matchers decline →
    // conservative keep), so each window may only ever be compared
    // against stats recorded in its own space.
    val cols = (statsCol.toSeq ++ statCols).distinct
    val numWindows: Map[String, (Long, Long)] =
      cols.flatMap(c => rangeOf(filters, c).map(c -> _)).toMap
    val strWindows: Map[String, (Long, Long)] =
      cols.filterNot(numWindows.contains)
        .flatMap(c => stringRangeOf(filters, c).map(c -> _)).toMap
    // allowed value-string sets per constrained partition column
    val partAllowed: Map[String, Set[String]] = partColNames.flatMap(c =>
      equalitySetOf(filters, c).map(c -> _)).toMap
    if (numWindows.isEmpty && strWindows.isEmpty && partAllowed.isEmpty)
      return entries
    entries.filter { e =>
      val numOk = numWindows.forall { case (c, (lb, ub)) =>
        val rng =
          (if (statsCol.contains(c))
            for { l <- e.lo; h <- e.hi } yield (l, h)
          else None).orElse(e.stats.get(c))
        rng match {
          case Some((lo, hi)) => hi >= lb && lo <= ub
          case None => true // no stats for this column: keep
        }
      }
      // encoded windows only meet ENCODED stats: the multi-stats map,
      // whose writer records string columns via stringStatFloor/Ceil.
      // The legacy lo/hi pair is NEVER consulted here — entriesFromDir
      // historically recorded it via cast('long') (numeric space), so
      // a string statsCol whose values parse as longs would compare
      // across spaces and silently prune matching files (ADVICE r11).
      // A string statsCol's encoded bounds now ride the multi-stats
      // map under its own name, so no pruning power is lost.
      val strOk = strWindows.forall { case (c, (lb, ub)) =>
        e.stats.get(c) match {
          case Some((lo, hi)) => hi >= lb && lo <= ub
          case None => true // no encoded stats for this column: keep
        }
      }
      val statsOk = numOk && strOk
      val partOk = partAllowed.forall { case (c, allowed) =>
        e.part.get(c) match {
          case Some(v) => allowed.contains(v)
          case None => true // unpartitioned or legacy file: keep
        }
      }
      statsOk && partOk
    }
  }

  private def lit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case _ => None
  }

  /** Fold the pushed conjuncts that constrain `col` with integer
    * literals into one [lb, ub] window; None when nothing constrains
    * the column (strict bounds widen by one — pruning stays safe, the
    * residual predicate keeps results exact). */
  def rangeOf(filters: Seq[Expression], col: String): Option[(Long, Long)] = {
    var lb = Long.MinValue
    var ub = Long.MaxValue
    var any = false
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(col)
      case _ => false
    }
    def tighten(lo: Option[Long], hi: Option[Long]): Unit = {
      lo.foreach { v => lb = math.max(lb, v); any = true }
      hi.foreach { v => ub = math.min(ub, v); any = true }
    }
    filters.foreach {
      case EqualTo(a, l) if isCol(a) => tighten(lit(l), lit(l))
      case EqualTo(l, a) if isCol(a) => tighten(lit(l), lit(l))
      case GreaterThanOrEqual(a, l) if isCol(a) => tighten(lit(l), None)
      case GreaterThan(a, l) if isCol(a) => tighten(lit(l), None)
      case LessThanOrEqual(a, l) if isCol(a) => tighten(None, lit(l))
      case LessThan(a, l) if isCol(a) => tighten(None, lit(l))
      // literal-first spellings
      case GreaterThanOrEqual(l, a) if isCol(a) => tighten(None, lit(l))
      case GreaterThan(l, a) if isCol(a) => tighten(None, lit(l))
      case LessThanOrEqual(l, a) if isCol(a) => tighten(lit(l), None)
      case LessThan(l, a) if isCol(a) => tighten(lit(l), None)
      // IN-list: the members' [min, max] hull is a sound window (a
      // file outside the hull can hold no member); only when EVERY
      // member is a translatable literal — a partial hull could
      // over-prune
      case org.apache.spark.sql.catalyst.expressions.In(a, vs)
          if isCol(a) && vs.nonEmpty =>
        val ls = vs.map(lit)
        if (ls.forall(_.isDefined)) {
          val xs = ls.flatten
          tighten(Some(xs.min), Some(xs.max))
        }
      case _ => ()
    }
    if (any) Some((lb, ub)) else None
  }

  private def strLit(e: Expression): Option[String] = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String,
      org.apache.spark.sql.types.StringType) => Some(v.toString)
    case _ => None
  }

  /** String twin of [[rangeOf]]: fold STRING-literal conjuncts on
    * `col` into one window in the stats grammar's encoded long space
    * (floor for lower bounds, ceil for upper — both monotone in
    * Spark's string order, so the interval test stays conservative;
    * see [[ManifestTable.stringStatFloor]]). */
  def stringRangeOf(filters: Seq[Expression],
      col: String): Option[(Long, Long)] = {
    var lb = Long.MinValue
    var ub = Long.MaxValue
    var any = false
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(col)
      case _ => false
    }
    def lo(v: Option[String]): Unit = v.foreach { s =>
      lb = math.max(lb, ManifestTable.stringStatFloor(s)); any = true
    }
    def hi(v: Option[String]): Unit = v.foreach { s =>
      ub = math.min(ub, ManifestTable.stringStatCeil(s)); any = true
    }
    filters.foreach {
      case EqualTo(a, l) if isCol(a) => lo(strLit(l)); hi(strLit(l))
      case EqualTo(l, a) if isCol(a) => lo(strLit(l)); hi(strLit(l))
      case GreaterThanOrEqual(a, l) if isCol(a) => lo(strLit(l))
      case GreaterThan(a, l) if isCol(a) => lo(strLit(l))
      case LessThanOrEqual(a, l) if isCol(a) => hi(strLit(l))
      case LessThan(a, l) if isCol(a) => hi(strLit(l))
      case GreaterThanOrEqual(l, a) if isCol(a) => hi(strLit(l))
      case GreaterThan(l, a) if isCol(a) => hi(strLit(l))
      case LessThanOrEqual(l, a) if isCol(a) => lo(strLit(l))
      case LessThan(l, a) if isCol(a) => lo(strLit(l))
      // LIKE 'p%' pushes as StartsWith: the whole prefix family lies
      // in [floor(p), familyCeil(p)] (unused window bytes padded high)
      case org.apache.spark.sql.catalyst.expressions.StartsWith(a, l)
          if isCol(a) =>
        strLit(l).foreach { p =>
          lo(Some(p))
          ub = math.min(ub, ManifestTable.stringPrefixFamilyCeil(p))
          any = true
        }
      // IN-list hull over string members (all-literal only). The hull
      // is computed in ENCODED space — min of floors, max of ceils —
      // because Java String ordering (UTF-16 code units) and the
      // stats encoding's UTF-8 unsigned-byte order diverge for
      // supplementary characters vs U+E000–U+FFFF: sorting the raw
      // strings could pick a head/last that is not the encoded
      // extreme and wrongly prune files holding real members.
      case org.apache.spark.sql.catalyst.expressions.In(a, vs)
          if isCol(a) && vs.nonEmpty =>
        val ls = vs.map(strLit)
        if (ls.forall(_.isDefined)) {
          val xs = ls.flatten
          lb = math.max(lb, xs.map(ManifestTable.stringStatFloor).min)
          ub = math.min(ub, xs.map(ManifestTable.stringStatCeil).max)
          any = true
        }
      case _ => ()
    }
    if (any) Some((lb, ub)) else None
  }

  /** Canonical string form of a pushed literal, matching the writer's
    * CAST(col AS STRING) partition-value recording — only types whose
    * two spellings provably agree participate (string and integrals);
    * anything else declines, which KEEPS files (pruning stays safe). */
  private def litString(e: Expression): Option[String] = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      Some(v.toString)
    case Literal(v: Long, LongType) => Some(v.toString)
    case Literal(v: Int, IntegerType) => Some(v.toString)
    case Literal(v: Short, ShortType) => Some(v.toString)
    case _ => None
  }

  /** Fold the pushed conjuncts that pin `col` to specific values
    * (equality / IN with literal members) into one allowed-value-string
    * set; None when nothing pins the column. Multiple conjuncts
    * intersect. A conjunct with any untranslatable member declines
    * entirely — partial sets would prune files the predicate keeps. */
  def equalitySetOf(filters: Seq[Expression],
      col: String): Option[Set[String]] = {
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(col)
      case _ => false
    }
    var acc: Option[Set[String]] = None
    def tighten(s: Set[String]): Unit =
      acc = Some(acc.map(_ intersect s).getOrElse(s))
    filters.foreach {
      case EqualTo(a, l) if isCol(a) => litString(l).foreach(v => tighten(Set(v)))
      case EqualTo(l, a) if isCol(a) => litString(l).foreach(v => tighten(Set(v)))
      case org.apache.spark.sql.catalyst.expressions.In(a, vs) if isCol(a) =>
        val strs = vs.map(litString)
        if (strs.forall(_.isDefined)) tighten(strs.flatten.toSet)
      case ins: org.apache.spark.sql.catalyst.expressions.InSet
          if isCol(ins.child) =>
        val strs = ins.hset.toSeq.map {
          case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
          case v: Long => Some(v.toString)
          case v: Int => Some(v.toString)
          case v: Short => Some(v.toString)
          case _ => None
        }
        if (strs.forall(_.isDefined)) tighten(strs.flatten.toSet)
      case _ => ()
    }
    acc
  }
}

/** Forwards ALL pushdown to the wrapped [[ParquetScanBuilder]] — the
  * Catalyst-filter route (the one Spark's V2 pushdown rule uses for
  * file scans, which also feeds the dataFilters that drive
  * [[ManifestFileIndex]]'s manifest-stats pruning) and column
  * pruning — then wraps the built scan so the SAME table gains the
  * streaming face without losing one native batch capability. */
class ManifestScanBuilder(inner: ParquetScanBuilder, dir: String,
    tableSchema: StructType, options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    inner.pushFilters(filters)

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def build(): Scan =
    new ManifestScan(inner.build(), dir, tableSchema, options)
}

/** Batch delegates to the native parquet scan; the streaming face is
  * the Delta-streaming-source shape — the COMMIT LOG is the stream
  * (offsets are log versions). */
class ManifestScan(inner: Scan, dir: String, tableSchema: StructType,
    options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = inner.readSchema()
  // the inner parquet scan's description carries the PushedFilters/
  // ReadSchema lines `.explain("formatted")` readers audit — keep them
  override def description(): String = inner.description()
  override def toBatch: Batch = inner.toBatch
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ManifestMicroBatchStream(dir, tableSchema, inner.readSchema(),
      ManifestScan.startingVersion(dir, options),
      Option(options.get("maxVersionsPerTrigger")).map(_.toInt))
}

object ManifestScan {
  /** The stream's first admitted version: `startingVersion`, or
    * `startingTimestamp` resolved through the same publish-mtime rule
    * as batch TIMESTAMP AS OF (Delta's startingTimestamp: the first
    * commit AT OR AFTER the timestamp — spelled here as the successor
    * of the newest version strictly before it). Default 1 (the whole
    * log). */
  private[sources] def startingVersion(dir: String,
      options: CaseInsensitiveStringMap): Int = {
    val sv = Option(options.get("startingVersion")).map(_.toInt)
    val st = Option(options.get("startingTimestamp"))
    require(sv.isEmpty || st.isEmpty,
      "specify at most one of startingVersion / startingTimestamp")
    st match {
      case Some(ts) =>
        val spark = SparkSession.active
        val millis = java.sql.Timestamp.valueOf(ts).getTime
        // versions published strictly BEFORE ts are excluded; the
        // stream starts at the next commit
        scala.util.Try(
          ManifestTable.versionAt(spark, dir, millis - 1) + 1)
          .getOrElse(1)
      case None => sv.getOrElse(1)
    }
  }
}

/** Version-offset micro-batch stream over the manifest log: each
  * micro-batch reads EXACTLY the files the data versions in
  * (start, end] added — compaction versions (dataChange=false) are
  * skipped, or every compacted row would double-count; st45 proves
  * the rule, this is its front-door spelling. Offsets are pure log
  * positions, so checkpoint recovery resumes mid-log with
  * exactly-once delivery for free — the same property Delta's
  * streaming source gets from its reservoir of commit versions.
  *
  * Each planned batch builds Spark's own parquet Batch over the added
  * files (file index + ParquetScanBuilder), so executors read through
  * the NATIVE vectorized parquet path; the reader factory is built
  * once from a zero-file template (its configuration depends only on
  * schemas + conf, never on the file list) and reads every batch's
  * FilePartitions.
  */
class ManifestMicroBatchStream(dir: String, tableSchema: StructType,
    readSchema: StructType, startingVersion: Int,
    maxVersionsPerTrigger: Option[Int] = None)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  private case class VOffset(v: Int) extends Offset {
    override def json(): String = v.toString
  }

  // Trigger.AvailableNow pins the drain target at stream start
  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(ManifestTable.versions(spark, dir).lastOption.getOrElse(0))

  override def initialOffset(): Offset = VOffset(startingVersion - 1)

  override def latestOffset(): Offset = availableNowTarget match {
    case Some(t) => VOffset(t)
    case None =>
      VOffset(ManifestTable.versions(spark, dir).lastOption.getOrElse(0))
  }

  // SupportsAdmissionControl's entry point (the one the engine calls
  // for AvailableNow sources); version offsets admit whole commits.
  // maxVersionsPerTrigger (Delta's maxFilesPerTrigger analog) caps how
  // many commits one micro-batch admits — the backfill-throttling knob:
  // a long log drains as many bounded batches instead of one giant one,
  // and the drained RESULT is batching-independent by construction.
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val target = latestOffset().asInstanceOf[VOffset].v
    maxVersionsPerTrigger match {
      case Some(m) =>
        VOffset(math.min(target, start.asInstanceOf[VOffset].v + m))
      case None => VOffset(target)
    }
  }

  override def deserializeOffset(json: String): Offset =
    VOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VOffset].v
    val e = end.asInstanceOf[VOffset].v
    if (e <= s) return Array.empty
    val added = ManifestTable.changedEntries(spark, dir, s, e)
    if (added.isEmpty) return Array.empty
    parquetBatch(added).planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // configuration depends only on (schemas, conf): a factory built
    // over zero files reads any batch's FilePartitions
    parquetBatch(Vector.empty).createReaderFactory()

  private def parquetBatch(
      entries: Vector[ManifestTable.ManifestEntry]): Batch = {
    val index = new ManifestFileIndex(spark, entries, None,
      Some(tableSchema))
    val b = ParquetScanBuilder(spark, index, tableSchema, tableSchema,
      CaseInsensitiveStringMap.empty())
    b.pruneColumns(readSchema)
    b.build().toBatch
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** DSv2 scan builder for DELETION-VECTOR snapshots: the batch plan
  * splits like [[ManifestTable.read]] — CLEAN files keep the full
  * native parquet path (pushdown, vectorized, columnar), DV-CARRYING
  * files are read row-based through a POSITION-SKIPPING reader, so a
  * point delete touching one file never taxes the other ten thousand
  * and a SQL user never needs `purge_dvs` just to SELECT.
  *
  * The dirty side NEVER receives pushdown and is planned
  * ONE-PARTITION-PER-FILE with splits in offset order: the wrapping
  * reader's running row count is then exactly the file's
  * `_metadata.row_index` — the key space the DV stores. Any row-group
  * or page skip would shift that space and delete the WRONG rows, so
  * every filter is reported residual (Spark re-applies them above the
  * scan; results stay exact, the dirty files just scan in full —
  * bounded by |DV-carrying files|, which compaction and purge keep
  * small). */
class DvManifestScanBuilder(spark: SparkSession, dir: String,
    entries: Vector[ManifestTable.ManifestEntry],
    statsCol: Option[String], dataSchema: StructType,
    colMap: Map[String, String],
    options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  // MAPPED + DV coexist: the files store stable PHYSICAL names and
  // the vectors key by (file path, position) — independent of any
  // column. Both underlying parquet scans run in PHYSICAL space; the
  // built Scan reports LOGICAL names (rows positional, zero copies).
  private val mapped = colMap.exists { case (l, p) => l != p }
  private def toPhysical(st: StructType): StructType =
    StructType(st.fields.map(f =>
      f.copy(name = colMap.getOrElse(f.name, f.name))))
  private val back: Map[String, String] = colMap.map(_.swap)
  private def toLogical(st: StructType): StructType =
    StructType(st.fields.map(f =>
      f.copy(name = back.getOrElse(f.name, f.name))))
  private val physSchema = if (mapped) toPhysical(dataSchema) else dataSchema

  private val (dirty, clean) = entries.partition(_.dv.isDefined)
  private val cleanBuilder = ParquetScanBuilder(spark,
    new ManifestFileIndex(spark, clean,
      if (mapped) None else statsCol, Some(physSchema)),
    physSchema, physSchema,
    if (mapped) CaseInsensitiveStringMap.empty() else options)
  private val dirtyBuilder = ParquetScanBuilder(spark,
    new ManifestFileIndex(spark, dirty, None, Some(physSchema)),
    physSchema, physSchema, CaseInsensitiveStringMap.empty())

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    // mapped: filters speak logical names, the files physical ones —
    // nothing is pushed (same documented trade as the clean mapped
    // scan); unmapped: the clean side keeps native pushdown
    if (!mapped) cleanBuilder.pushFilters(filters)
    filters // ALL residual — the dirty side's position space forbids
            // reader-level skipping; see the class doc
  }
  override def pushedFilters: Array[Predicate] =
    if (mapped) Array.empty else cleanBuilder.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val phys = if (mapped) toPhysical(requiredSchema) else requiredSchema
    cleanBuilder.pruneColumns(phys)
    dirtyBuilder.pruneColumns(phys)
  }
  override def build(): Scan = {
    val is = new ManifestDvScan(cleanBuilder.build(), dirtyBuilder.build(),
      ManifestTable.baseUriPath(spark, dir),
      ManifestTable.dvPathsByKey(spark, dir, dirty),
      new DvStore.SerializableConf(spark.sessionState.newHadoopConf()),
      dir, dataSchema, options)
    if (!mapped) is
    else new Scan {
      override def readSchema(): StructType = toLogical(is.readSchema())
      override def description(): String =
        is.description() + " (column-mapped)"
      override def toBatch: Batch = is.toBatch
      override def toMicroBatchStream(cp: String): MicroBatchStream =
        is.toMicroBatchStream(cp)
    }
  }
}

/** DSv2 scan builder for COLUMN-MAPPED snapshots: the files store
  * stable PHYSICAL names, Spark's analyzer speaks the log's LOGICAL
  * names. The parquet scan is built over the physical schema (same
  * field types and order), column pruning is translated name-by-name
  * on the way in, and `readSchema` translates back on the way out —
  * rows are positional, so no data moves. Filter pushdown is simply
  * not offered (Spark keeps every filter above the scan; manifest
  * stats pruning is lost for mapped tables — a documented trade, not
  * a correctness one). */
class MappedManifestScanBuilder(spark: SparkSession,
    entries: Vector[ManifestTable.ManifestEntry],
    dataSchema: StructType, colMap: Map[String, String])
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private def toPhysical(st: StructType): StructType =
    StructType(st.fields.map(f =>
      f.copy(name = colMap.getOrElse(f.name, f.name))))
  private val back: Map[String, String] = colMap.map(_.swap)
  private def toLogical(st: StructType): StructType =
    StructType(st.fields.map(f =>
      f.copy(name = back.getOrElse(f.name, f.name))))

  private val phys = toPhysical(dataSchema)
  private val inner = ParquetScanBuilder(spark,
    new ManifestFileIndex(spark, entries, None, Some(phys)),
    phys, phys, CaseInsensitiveStringMap.empty())

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(toPhysical(requiredSchema))

  override def build(): Scan = new Scan {
    private val is = inner.build()
    override def readSchema(): StructType = toLogical(is.readSchema())
    override def description(): String =
      is.description() + " (column-mapped)"
    override def toBatch: Batch = is.toBatch
  }
}

/** DSv2 scan builder for HIVE-CONVERTED snapshots: the files do not
  * store the partition columns — their values live in the LOG's
  * per-file tuples. The parquet scan runs over the DATA-ONLY schema;
  * planning attaches each file's tuple to its input partition and the
  * reader appends the values as literal columns (the same JoinedRow +
  * UnsafeProjection pattern Spark's own FileFormat uses for partition
  * columns, and the CDF reader uses for feed columns). Manifest-level
  * pruning still applies: partition-column equality prunes files from
  * the plan via the recorded tuples, stats windows via any recorded
  * stats; everything is re-applied residually above the scan. */
class HiveManifestScanBuilder(spark: SparkSession, dir: String,
    entries: Vector[ManifestTable.ManifestEntry],
    statsCol: Option[String], fullSchema: StructType,
    partCols: Seq[String])
  extends ScanBuilder with SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private val partSet = partCols.toSet
  private val dataOnly = StructType(
    fullSchema.fields.filterNot(f => partSet.contains(f.name)))
  private var required: StructType = fullSchema
  private var filters: Seq[Expression] = Nil

  override def pushFilters(fs: Seq[Expression]): Seq[Expression] = {
    filters = fs
    fs // ALL residual: partition columns exist only above the scan
  }
  override def pushedFilters: Array[Predicate] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val kept = ManifestFileIndex.pruneEntries(entries, statsCol, filters)
    val dataReq = StructType(
      required.fields.filterNot(f => partSet.contains(f.name)))
    val partReq = partCols.filter(c => required.fieldNames.contains(c))
    val inner = {
      val b = ParquetScanBuilder(spark,
        new ManifestFileIndex(spark, kept, None, Some(dataOnly)),
        dataOnly, dataOnly, CaseInsensitiveStringMap.empty())
      b.pruneColumns(dataReq)
      b.build()
    }
    new HiveManifestScan(inner, kept,
      ManifestTable.baseUriPath(spark, dir), dir,
      StructType(dataReq.fields ++ partReq.map(c => fullSchema(c))),
      partReq)
  }
}

/** Batch face of the hive-converted scan: one input partition per
  * FILE with its partition tuple attached. */
class HiveManifestScan(inner: Scan,
    kept: Vector[ManifestTable.ManifestEntry], base: String, dir: String,
    outSchema: StructType, partReq: Seq[String]) extends Scan {

  override def readSchema(): StructType = outSchema
  override def description(): String =
    inner.description() + " (hive-converted: log-filled partitions)"

  override def toBatch: Batch = new Batch {
    private val ib = inner.toBatch
    override def planInputPartitions(): Array[InputPartition] = {
      import org.apache.spark.sql.execution.datasources.FilePartition
      val byKey = kept.map(e =>
        new Path(e.path).toUri.getPath -> e.part).toMap
      ib.planInputPartitions().flatMap {
        case fp: FilePartition => fp.files
        case other => sys.error(
          s"hive scan: unexpected non-file partition $other")
      }
        .groupBy(_.filePath.toPath.toUri.getPath)
        .toArray.sortBy(_._1)
        .zipWithIndex.map { case ((key, files), i) =>
          val part = byKey.getOrElse(key, sys.error(
            s"hive scan: no log entry for planned file $key"))
          HiveFillPartition(FilePartition(i, files.sortBy(_.start)),
            partReq.map(part(_)).toArray)
        }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new HiveFillReaderFactory(ib.createReaderFactory(), outSchema,
        partReq.size)
  }

  override def toMicroBatchStream(cp: String): MicroBatchStream =
    sys.error(s"stream tail of hive-converted table $dir is not " +
      "supported — compact (OPTIMIZE) first to materialize the " +
      "partition columns")
}

/** One hive-era FILE: its splits in offset order + the partition
  * VALUES (string form; the reader casts to the schema's types). */
case class HiveFillPartition(
    inner: org.apache.spark.sql.execution.datasources.FilePartition,
    values: Array[String]) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Executor half: native parquet reader underneath, a JoinedRow +
  * UnsafeProjection appending the file's partition values as typed
  * literals on top. */
class HiveFillReaderFactory(data: PartitionReaderFactory,
    outSchema: StructType, nPart: Int) extends PartitionReaderFactory {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{Cast, GenericInternalRow, JoinedRow, Literal, UnsafeProjection}
  import org.apache.spark.sql.connector.read.PartitionReader

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case HiveFillPartition(inner, values) =>
      val partTypes = outSchema.fields.takeRight(nPart).map(_.dataType)
      val lits: Array[Any] = values.zip(partTypes).map { case (v, dt) =>
        Cast(Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(v),
          org.apache.spark.sql.types.StringType), dt, Some("UTC"))
          .eval(null)
      }
      val extra: InternalRow = new GenericInternalRow(lits)
      val r = data.createReader(inner)
      new PartitionReader[InternalRow] {
        private val joined = new JoinedRow
        private val proj =
          UnsafeProjection.create(outSchema.fields.map(_.dataType))
        override def next(): Boolean = r.next()
        override def get(): InternalRow = proj(joined(r.get(), extra))
        override def close(): Unit = r.close()
      }
    case other => sys.error(s"hive scan: unexpected partition $other")
  }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    sys.error("hive scan is row-based (supportColumnarReads = false)")
}

/** The combined clean + dirty scan. Batch = native partitions for the
  * clean files plus one [[DvInputPartition]] per dirty FILE (its
  * splits in offset order, its DV parquet FILE PATHS embedded — the
  * reader loads its own file's sorted positions executor-side via
  * [[graft.operators.DvStore]]; planning never materializes positions
  * on the driver). The streaming face is the same log-version
  * micro-batch stream as the plain scan (append-only contract: MOR
  * versions are dataChange-skipped there). */
class ManifestDvScan(cleanScan: Scan, dirtyScan: Scan, base: String,
    dvByKey: Map[String, String], conf: DvStore.SerializableConf,
    dir: String, tableSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends Scan {

  override def readSchema(): StructType = cleanScan.readSchema()
  override def description(): String =
    cleanScan.description() + " (+ merge-on-read deletion vectors)"

  override def toBatch: Batch = new Batch {
    private val cb = cleanScan.toBatch
    private val db = dirtyScan.toBatch
    override def planInputPartitions(): Array[InputPartition] = {
      import org.apache.spark.sql.execution.datasources.FilePartition
      val cps = cb.planInputPartitions()
      val dirtyFiles = db.planInputPartitions().flatMap {
        case fp: FilePartition => fp.files
        case other => sys.error(
          s"dv scan: unexpected non-file partition $other")
      }
      // one recursive listing per distinct DV directory — O(#files)
      // driver metadata, the only driver-side DV work left
      val listings = dvByKey.values.toSeq.distinct
        .map(p => p -> DvStore.listDv(conf.value, p)).toMap
      val dps = dirtyFiles
        .groupBy(pf => ManifestTable.dvKeyStr(base, pf.filePath.toPath.toString))
        .toArray.sortBy(_._1)
        .zipWithIndex.map { case ((key, files), i) =>
          val dvFiles = dvByKey.get(key)
            .map(p => listings(p).filesFor(key))
            .getOrElse(Array.empty[String])
          DvInputPartition(
            FilePartition(cps.length + i, files.sortBy(_.start)),
            dvFiles, base, key)
        }
      cps ++ dps
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new DvPartitionReaderFactory(cb.createReaderFactory(),
        db.createReaderFactory(), conf)
  }

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new ManifestMicroBatchStream(dir, tableSchema, cleanScan.readSchema(),
      ManifestScan.startingVersion(dir, options),
      Option(options.get("maxVersionsPerTrigger")).map(_.toInt))
}

/** One dirty FILE: all its splits in offset order + the DV parquet
  * files holding its deleted positions (loaded by the READER — the
  * partition ships paths, never position arrays). */
case class DvInputPartition(
    inner: org.apache.spark.sql.execution.datasources.FilePartition,
    dvFiles: Array[String], base: String, key: String)
  extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Dispatching reader factory: clean partitions keep the native
  * parquet readers; [[DvInputPartition]]s are read with a running row
  * counter that skips the deleted positions — the executor-side half
  * of merge-on-read, including LOADING the positions from the DV
  * parquet slice this partition names. The WHOLE scan reports
  * row-based (Spark refuses mixed row/columnar partitions in one
  * BatchScan), so a DV-carrying snapshot trades the columnar path for
  * correct deletes until `purge_dvs`/compaction cleans it — the same
  * reader-mode downgrade Delta's DV scans accept. */
class DvPartitionReaderFactory(clean: PartitionReaderFactory,
    dirty: PartitionReaderFactory, conf: DvStore.SerializableConf)
  extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = p match {
    case DvInputPartition(inner, dvFiles, base, key) =>
      // positions load HERE, on the executor that reads the file —
      // O(this file's deletions) memory, nothing on the driver
      val deleted = DvStore.loadPositions(conf.value, dvFiles, base, key)
      val r = dirty.createReader(inner)
      new org.apache.spark.sql.connector.read.PartitionReader[
          org.apache.spark.sql.catalyst.InternalRow] {
        private var si = 0
        private var rowIdx = -1L
        override def next(): Boolean = {
          while (r.next()) {
            rowIdx += 1
            // positions and row indices are both strictly increasing:
            // one cursor, no per-row set probe
            if (si < deleted.length && deleted(si) == rowIdx) si += 1
            else return true
          }
          false
        }
        override def get(): org.apache.spark.sql.catalyst.InternalRow =
          r.get()
        override def close(): Unit = r.close()
      }
    case other => clean.createReader(other)
  }

  override def createColumnarReader(p: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] =
    sys.error("dv scan is row-based (supportColumnarReads = false)")
}

/** CHANGE-DATA-FEED face of the front door (Delta's `readChangeFeed`):
  *
  * {{{
  *   spark.read.format("graft-manifest").option("readChangeFeed", true)
  *     .option("startingVersion", 2).load(dir)           // batch feed
  *   spark.readStream.format("graft-manifest")
  *     .option("readChangeFeed", true).load(dir)         // streaming feed
  * }}}
  *
  * Both faces plan from [[ManifestTable.changeFeedActions]] — the same
  * branch logic as the batch [[ManifestTable.changeFeedRows]] (inserts
  * from added files, write-time captures from `_change_data`, MOR
  * deletes as DV position diffs, compaction/purge silent) — so the
  * three doors agree row-for-row. Executors read every partition
  * through Spark's native parquet readers; the wrapper appends the two
  * literal columns (`_change_type`, `_commit_version`) and, for MOR
  * delete partitions, KEEPS only the newly-deleted positions (the
  * inverse of [[DvPartitionReaderFactory]]'s skip — one cursor, no
  * per-row set probe). Read-only by design: writes go through the
  * table face. */
class GraftCdfTable(dir: String, logical: StructType,
    colMap: Map[String, String]) extends Table with SupportsRead {

  private val cdfSchema = logical
    .add("_change_type", org.apache.spark.sql.types.StringType)
    .add("_commit_version", IntegerType)

  override def name(): String = s"graft-manifest change feed $dir"
  override def schema(): StructType = cdfSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => new CdfScan(dir, logical, colMap, options)
}

/** The CDF scan: batch reads (startingVersion−1, endingVersion] (ending
  * defaults to latest); the streaming face is version-offset like
  * [[ManifestMicroBatchStream]], feed-shaped. No pushdown on either
  * face — filters stay residual (Spark re-applies them above the scan;
  * a file or row-group skip could neither see `_change_type` nor keep
  * the MOR position space intact). */
class CdfScan(dir: String, logical: StructType,
    colMap: Map[String, String], options: CaseInsensitiveStringMap)
  extends Scan {

  private val cdfSchema = logical
    .add("_change_type", org.apache.spark.sql.types.StringType)
    .add("_commit_version", IntegerType)

  override def readSchema(): StructType = cdfSchema
  override def description(): String = s"graft-manifest change feed $dir"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val spark = SparkSession.active
      val from = ManifestScan.startingVersion(dir, options) - 1
      val to = Option(options.get("endingVersion")).map(_.toInt)
        .getOrElse(ManifestTable.versions(spark, dir).lastOption.getOrElse(0))
      CdfPlanner.partitions(spark, dir, logical, colMap, from, to)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      CdfPlanner.readerFactory(SparkSession.active, logical, colMap)
  }

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new CdfMicroBatchStream(dir, logical, colMap,
      ManifestScan.startingVersion(dir, options),
      Option(options.get("maxVersionsPerTrigger")).map(_.toInt))
}

/** Version-offset micro-batch stream over the CHANGE FEED: each
  * micro-batch delivers the feed rows of the versions in (start, end]
  * — the Delta CDF streaming-source shape. Offsets are log versions
  * (checkpoint recovery = resume mid-log, exactly-once), identical to
  * [[ManifestMicroBatchStream]]; only the planned partitions differ. */
class CdfMicroBatchStream(dir: String, logical: StructType,
    colMap: Map[String, String], startingVersion: Int,
    maxVersionsPerTrigger: Option[Int] = None)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  private case class VOffset(v: Int) extends Offset {
    override def json(): String = v.toString
  }

  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(ManifestTable.versions(spark, dir).lastOption.getOrElse(0))

  override def initialOffset(): Offset = VOffset(startingVersion - 1)

  override def latestOffset(): Offset = availableNowTarget match {
    case Some(t) => VOffset(t)
    case None =>
      VOffset(ManifestTable.versions(spark, dir).lastOption.getOrElse(0))
  }

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val target = latestOffset().asInstanceOf[VOffset].v
    maxVersionsPerTrigger match {
      case Some(m) =>
        VOffset(math.min(target, start.asInstanceOf[VOffset].v + m))
      case None => VOffset(target)
    }
  }

  override def deserializeOffset(json: String): Offset =
    VOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VOffset].v
    val e = end.asInstanceOf[VOffset].v
    CdfPlanner.partitions(spark, dir, logical, colMap, s, e)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    CdfPlanner.readerFactory(spark, logical, colMap)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Shared CDF planning: log actions → input partitions + the one
  * reader factory that serves all three partition kinds. */
private[sources] object CdfPlanner {
  import org.apache.spark.sql.execution.datasources.FilePartition

  private def physical(logical: StructType,
      colMap: Map[String, String]): StructType =
    ManifestTable.physicalSchema(logical, colMap)

  private def captureSchema(phys: StructType): StructType =
    phys.add("_change_type", org.apache.spark.sql.types.StringType)

  /** Native parquet planning over a set of manifest entries: the
    * [[FilePartition]]s Spark's own scan would read them with. */
  private def fileParts(spark: SparkSession,
      entries: Vector[ManifestTable.ManifestEntry],
      schema: StructType): Array[FilePartition] = {
    val index = new ManifestFileIndex(spark, entries, None, Some(schema))
    ParquetScanBuilder(spark, index, schema, schema,
      CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[FilePartition])
  }

  def partitions(spark: SparkSession, dir: String, logical: StructType,
      colMap: Map[String, String], fromVersion: Int,
      toVersion: Int): Array[InputPartition] = {
    if (toVersion <= fromVersion) return Array.empty
    val phys = physical(logical, colMap)
    val out = Array.newBuilder[InputPartition]
    ManifestTable.changeFeedActions(spark, dir, fromVersion, toVersion)
      .foreach {
        case ManifestTable.CdfInsert(v, entries) =>
          fileParts(spark, entries, phys)
            .foreach(fp => out += CdfInsertPartition(fp, v))
        case ManifestTable.CdfCapture(v, path) =>
          val e = Vector(ManifestTable.ManifestEntry(path, 0L))
          fileParts(spark, e, captureSchema(phys))
            .foreach(fp => out += CdfCapturePartition(fp, v))
        case ManifestTable.CdfMorDelete(v, entries, dvByKey) =>
          val base = ManifestTable.baseUriPath(spark, dir)
          val conf = spark.sessionState.newHadoopConf()
          // one listing per distinct DV dir (driver metadata only);
          // the new-minus-old position diff runs in the reader
          val listings = dvByKey.values
            .flatMap { case (n, o) => Seq(n) ++ o }.toSeq.distinct
            .map(p => p -> DvStore.listDv(conf, p)).toMap
          // one partition per FILE with splits in offset order — the
          // keep-cursor's running row count must be the file's own
          // row_index space (same discipline as [[ManifestDvScan]])
          fileParts(spark, entries, phys)
            .flatMap(_.files)
            .groupBy(pf =>
              ManifestTable.dvKeyStr(base, pf.filePath.toPath.toString))
            .toArray.sortBy(_._1)
            .foreach { case (key, fs) =>
              dvByKey.get(key).foreach { case (newDv, oldDv) =>
                out += CdfMorPartition(
                  FilePartition(0, fs.sortBy(_.start)),
                  listings(newDv).filesFor(key),
                  oldDv.map(p => listings(p).filesFor(key))
                    .getOrElse(Array.empty[String]),
                  base, key, v)
              }
            }
      }
    out.result()
  }

  def readerFactory(spark: SparkSession, logical: StructType,
      colMap: Map[String, String]): PartitionReaderFactory = {
    val phys = physical(logical, colMap)
    // a factory's configuration depends only on (schemas, conf) — one
    // zero-file template per read schema serves every partition
    def template(schema: StructType): PartitionReaderFactory = {
      val index = new ManifestFileIndex(spark, Vector.empty, None,
        Some(schema))
      ParquetScanBuilder(spark, index, schema, schema,
        CaseInsensitiveStringMap.empty())
        .build().toBatch.createReaderFactory()
    }
    new CdfReaderFactory(template(phys), template(captureSchema(phys)),
      phys,
      new DvStore.SerializableConf(spark.sessionState.newHadoopConf()))
  }
}

/** An insert action's files (rows become 'insert'). */
case class CdfInsertPartition(
    inner: org.apache.spark.sql.execution.datasources.FilePartition,
    version: Int) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** A `_change_data` capture file (rows carry their own _change_type). */
case class CdfCapturePartition(
    inner: org.apache.spark.sql.execution.datasources.FilePartition,
    version: Int) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** One MOR-deleted FILE: splits in offset order + the DV parquet
  * slices (this commit's and the previous version's) whose position
  * DIFF the reader computes and EMITS as 'delete' rows — paths only,
  * never position arrays. */
case class CdfMorPartition(
    inner: org.apache.spark.sql.execution.datasources.FilePartition,
    newDvFiles: Array[String], oldDvFiles: Array[String],
    base: String, key: String, version: Int) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** Executor half of the CDF read: native parquet readers underneath,
  * a [[org.apache.spark.sql.catalyst.expressions.JoinedRow]] +
  * UnsafeProjection appending the literal feed columns on top (the
  * same pattern Spark's own FileFormat uses for partition columns).
  * Row-based throughout — feed rows cross into non-codegen'd wrappers
  * once, bounded by the feed's own size, never the table's. */
class CdfReaderFactory(data: PartitionReaderFactory,
    capture: PartitionReaderFactory, physSchema: StructType,
    conf: DvStore.SerializableConf)
  extends PartitionReaderFactory {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
  import org.apache.spark.sql.connector.read.PartitionReader
  import org.apache.spark.sql.types.DataType
  import org.apache.spark.unsafe.types.UTF8String

  override def supportColumnarReads(p: InputPartition): Boolean = false

  // output row types: data columns, then _change_type, _commit_version
  private def feedTypes: Array[DataType] =
    physSchema.fields.map(_.dataType) ++
      Array[DataType](org.apache.spark.sql.types.StringType, IntegerType)

  /** inner row + extra literals → one unsafe feed row (projection
    * built executor-side; JoinedRow reuse is the FileFormat partition-
    * column pattern). */
  private def appending(r: PartitionReader[InternalRow],
      extra: InternalRow): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow
      private val proj = UnsafeProjection.create(feedTypes)
      override def next(): Boolean = r.next()
      override def get(): InternalRow = proj(joined(r.get(), extra))
      override def close(): Unit = r.close()
    }

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case CdfInsertPartition(inner, v) =>
      appending(data.createReader(inner), new GenericInternalRow(
        Array[Any](UTF8String.fromString("insert"), v)))
    case CdfCapturePartition(inner, v) =>
      // capture rows already carry _change_type: append version only
      appending(capture.createReader(inner),
        new GenericInternalRow(Array[Any](v)))
    case CdfMorPartition(inner, newDv, oldDv, base, key, v) =>
      // the freshly-deleted positions load HERE, executor-side:
      // new DV minus old DV, one linear merge of two sorted loads
      val keep = DvStore.loadFreshPositions(conf.value, newDv, oldDv,
        base, key)
      appending(keepOnly(data.createReader(inner), keep),
        new GenericInternalRow(
          Array[Any](UTF8String.fromString("delete"), v)))
    case other => sys.error(s"cdf scan: unexpected partition $other")
  }

  /** Emit ONLY the listed positions — the inverse of the DV skip
    * reader's cursor. */
  private def keepOnly(r: PartitionReader[InternalRow],
      keep: Array[Long]): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var si = 0
      private var rowIdx = -1L
      override def next(): Boolean = {
        while (si < keep.length && r.next()) {
          rowIdx += 1
          if (keep(si) == rowIdx) { si += 1; return true }
        }
        false
      }
      override def get(): InternalRow = r.get()
      override def close(): Unit = r.close()
    }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    sys.error("cdf scan is row-based (supportColumnarReads = false)")
}

object GraftManifestTable {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.sources

  /** v1 Filter → Column for the COW DELETE path; None = untranslatable
    * (canDeleteWhere then refuses and Spark raises at analysis). */
  private[sources] def filterToColumn(f: sources.Filter): Option[Column] =
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) => Some(col(a).contains(v))
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case sources.And(l, r) =>
        for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a && b
      case sources.Or(l, r) =>
        for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a || b
      case sources.Not(c) => filterToColumn(c).map(!_)
      case _ => None
    }
}
