package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.ManifestTable

/** SQL maintenance surface for the manifest format — Spark 4's DSv2
  * stored procedures (the `CALL` statement Iceberg pioneered), bound
  * through the catalog:
  *
  * {{{
  *   CALL graft.optimize(tbl => 't', target_mb => 128)
  *   CALL graft.zorder(tbl => 't', col1 => 'x', col2 => 'y',
  *                     target_files => 16)
  *   CALL graft.vacuum(tbl => 't', keep => 3)
  *   CALL graft.restore(tbl => 't', version => 2)
  *   CALL graft.purge_dvs(tbl => 't')
  * }}}
  *
  * Each procedure is driver-side table maintenance over the SAME
  * commit protocol as the Scala API — the CALL is just the SQL
  * spelling; results come back as one summary row through a
  * [[LocalScan]].
  */
object GraftProcedures {

  private def param(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def paramD(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One self-binding procedure: fixed parameters, one result row. */
  private final class Proc(name0: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      body: (SparkSession, InternalRow) => InternalRow)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = name0
    override def description(): String = s"graft-manifest $name0"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val row = body(SparkSession.active, input)
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = resultSchema
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  /** The procedures, keyed by lower-case name; `dirOf` resolves a
    * table name against the owning catalog's warehouse. */
  def load(name: String, dirOf: String => String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "optimize" => Some(new Proc("optimize",
        Array(param("tbl", StringType),
          paramD("target_mb", IntegerType, "128")),
        StructType.fromDDL(
          "version INT, files_before BIGINT, files_after BIGINT"),
        (s, in) => {
          val dir = dirOf(in.getUTF8String(0).toString)
          val before = ManifestTable.snapshot(s, dir).entries.size.toLong
          val v = ManifestTable.compactCommit(s, dir,
            targetBytes = in.getInt(1).toLong << 20)
          val after = ManifestTable.snapshot(s, dir).entries.size.toLong
          new GenericInternalRow(Array[Any](v, before, after))
        }))
      case "zorder" => Some(new Proc("zorder",
        Array(param("tbl", StringType), param("col1", StringType),
          param("col2", StringType),
          paramD("target_files", IntegerType, "16")),
        StructType.fromDDL("version INT, files BIGINT"),
        (s, in) => {
          val dir = dirOf(in.getUTF8String(0).toString)
          val v = ManifestTable.clusterCommit(s, dir,
            (in.getUTF8String(1).toString, in.getUTF8String(2).toString),
            targetFiles = in.getInt(3))
          val n = ManifestTable.snapshot(s, dir).entries.size.toLong
          new GenericInternalRow(Array[Any](v, n))
        }))
      case "vacuum" => Some(new Proc("vacuum",
        Array(param("tbl", StringType), paramD("keep", IntegerType, "1")),
        StructType.fromDDL("oldest_kept INT, latest INT"),
        (s, in) => {
          val dir = dirOf(in.getUTF8String(0).toString)
          ManifestTable.vacuum(s, dir, keep = in.getInt(1))
          val vs = ManifestTable.versions(s, dir)
          new GenericInternalRow(Array[Any](vs.head, vs.last))
        }))
      case "restore" => Some(new Proc("restore",
        Array(param("tbl", StringType), param("version", IntegerType)),
        StructType.fromDDL("restored_to INT, new_version INT"),
        (s, in) => {
          val dir = dirOf(in.getUTF8String(0).toString)
          val v = ManifestTable.restore(s, dir, in.getInt(1))
          new GenericInternalRow(Array[Any](in.getInt(1), v))
        }))
      case "history" => Some(new HistoryProc(dirOf))
      case "detail" => Some(new Proc("detail",
        Array(param("tbl", StringType)),
        StructType.fromDDL(
          "version INT, n_files BIGINT, size_bytes BIGINT, " +
            "rows BIGINT, live_rows BIGINT, part_cols STRING, " +
            "stats_col STRING, column_mapped BOOLEAN, n_checks INT, " +
            "dv_files INT, cdc_enabled BOOLEAN"),
        (s, in) => {
          // Delta's DESCRIBE DETAIL: the snapshot's shape in one row —
          // O(files) driver-side metadata, the same planning read every
          // table format pays
          val dir = dirOf(in.getUTF8String(0).toString)
          val snap = ManifestTable.snapshot(s, dir)
          val hconf = s.sparkContext.hadoopConfiguration
          val bytes = snap.entries.map { e =>
            val p = new Path(ManifestTable.resolvePath(dir, e.path))
            val f = p.getFileSystem(hconf)
            if (f.exists(p)) f.getContentSummary(p).getLength else 0L
          }.sum
          new GenericInternalRow(Array[Any](snap.version,
            snap.entries.size.toLong, bytes,
            snap.entries.map(_.rows).sum,
            snap.entries.map(_.liveRows).sum,
            UTF8String.fromString(snap.partCols.mkString(",")),
            UTF8String.fromString(snap.statsCol.getOrElse("")),
            snap.mapped, snap.checks.size,
            snap.entries.count(_.dv.isDefined), snap.cdcOn))
        }))
      case "set_partitioning" => Some(new Proc("set_partitioning",
        Array(param("tbl", StringType),
          paramD("cols", StringType, "''")),
        StructType.fromDDL("version INT, part_cols STRING"),
        (s, in) => {
          // PARTITION EVOLUTION (Iceberg's spec change): a metadata
          // commit; old files keep their own tuples, pruning stays
          // exact across mixed specs (see ManifestTable.evolvePartitioning)
          val dir = dirOf(in.getUTF8String(0).toString)
          val cols = in.getUTF8String(1).toString.split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val v = ManifestTable.evolvePartitioning(s, dir, cols)
          new GenericInternalRow(Array[Any](v,
            UTF8String.fromString(cols.mkString(","))))
        }))
      case "convert" => Some(new Proc("convert",
        Array(param("tbl", StringType)),
        StructType.fromDDL("version INT, files BIGINT, rows BIGINT"),
        (s, in) => {
          // CONVERT TO (Delta's adopt-in-place): the plain parquet
          // directory at the table's warehouse path becomes v1 — zero
          // bytes rewritten (see ManifestTable.convert)
          val dir = dirOf(in.getUTF8String(0).toString)
          val v = ManifestTable.convert(s, dir)
          val snap = ManifestTable.snapshot(s, dir)
          new GenericInternalRow(Array[Any](v,
            snap.entries.size.toLong, snap.rows))
        }))
      case "clone" => Some(new Proc("clone",
        Array(param("tbl", StringType), param("target", StringType),
          paramD("version", IntegerType, "-1")),
        StructType.fromDDL("version INT, files BIGINT, rows BIGINT"),
        (s, in) => {
          // SHALLOW CLONE (Delta's CLONE … SHALLOW): the target's first
          // commit references the source's files — zero data copied,
          // independent logs from then on (see ManifestTable.cloneShallow)
          val src = dirOf(in.getUTF8String(0).toString)
          val dst = dirOf(in.getUTF8String(1).toString)
          val asOf = Option(in.getInt(2)).filter(_ >= 0)
          val v = ManifestTable.cloneShallow(s, src, dst, asOf)
          val snap = ManifestTable.snapshot(s, dst)
          new GenericInternalRow(Array[Any](v,
            snap.entries.size.toLong, snap.entries.map(_.liveRows).sum))
        }))
      case "purge_dvs" => Some(new Proc("purge_dvs",
        Array(param("tbl", StringType)),
        StructType.fromDDL("version INT, rows_live BIGINT"),
        (s, in) => {
          val dir = dirOf(in.getUTF8String(0).toString)
          val v = ManifestTable.purgeDvs(s, dir)
          val live = ManifestTable.snapshot(s, dir)
            .entries.map(_.liveRows).sum
          new GenericInternalRow(Array[Any](v, live))
        }))
      case _ => None
    }

  /** DESCRIBE HISTORY as a procedure: the commit log's one-row-per-
    * version view (files added/removed, rows added, dataChange, txn,
    * schema-change mark, publish timestamp), multi-row result. */
  private final class HistoryProc(dirOf: String => String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = "history"
    override def description(): String = "graft-manifest history"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      Array(param("tbl", StringType))
    override def isDeterministic: Boolean = false
    private val schema = StructType.fromDDL(
      "version INT, n_files_added BIGINT, n_files_removed BIGINT, " +
        "rows_added BIGINT, compaction BOOLEAN, data_change BOOLEAN, " +
        "txn STRING, schema_changed BOOLEAN, commit_ts_ms BIGINT")
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val s = SparkSession.active
      val dir = dirOf(input.getUTF8String(0).toString)
      // O(#versions) driver metadata — the same read DESCRIBE
      // HISTORY performs everywhere. (Named `out`, NOT `rows`: inside
      // the anonymous LocalScan the name `rows` resolves to the
      // method itself and the self-tail-call compiles to an infinite
      // loop.)
      val out = ManifestTable.history(s, dir)
        .orderBy(org.apache.spark.sql.functions.col("version"))
        .collect()
        .map { r =>
          new GenericInternalRow(Array[Any](
            r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getBoolean(4), r.getBoolean(5),
            Option(r.getString(6)).map(UTF8String.fromString).orNull,
            r.getBoolean(7), r.getLong(8))): InternalRow
        }
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = schema
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  val names: Seq[String] =
    Seq("optimize", "zorder", "vacuum", "restore", "purge_dvs",
      "history", "clone", "set_partitioning", "detail", "convert")
}
