package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.ManifestTable

/** SQL catalog for the manifest table format — the catalog path a
  * Delta/Iceberg user expects, on top of the same commit log:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.GraftManifestCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  *
  *   CREATE TABLE graft.orders_t (k BIGINT, cents BIGINT)
  *   INSERT INTO graft.orders_t SELECT ...
  *   INSERT OVERWRITE graft.orders_t SELECT ...
  *   SELECT * FROM graft.orders_t VERSION AS OF 2      -- time travel
  *   SELECT * FROM graft.orders_t TIMESTAMP AS OF '...'
  * }}}
  *
  * A table is a warehouse subdirectory holding a `_manifests` commit
  * log; namespaces are intermediate directories. CREATE TABLE commits
  * version 1 with ZERO files and the schema in the log (the schema
  * always rode the log — an empty table is just the degenerate
  * snapshot). Reads resolve through [[GraftManifestTable]], so SQL
  * SELECTs get the same plan-pinned snapshots, native parquet scans
  * and manifest-stats pruning as `spark.read.format("graft-manifest")`;
  * writes go through the V1 bridge into the SAME optimistic commit
  * path as the Scala API. VERSION AS OF maps to the log version,
  * TIMESTAMP AS OF (Spark hands micros) to the publish-mtime rule of
  * [[ManifestTable.versionAt]].
  */
class GraftManifestCatalog extends TableCatalog with SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  /** Table maintenance through SQL `CALL` (Spark 4 DSv2 stored
    * procedures): optimize / zorder / vacuum / restore / purge_dvs,
    * each resolving its `tbl` argument against this catalog's
    * warehouse and running the SAME commit-protocol maintenance as
    * the Scala API. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident.name(),
      t => { // the tbl argument may be namespace-qualified ("ns.t")
        val parts = t.split("\\.")
        tableDir(Identifier.of(parts.init, parts.last)).toString
      })
      .getOrElse(throw new UnsupportedOperationException(
        s"no procedure ${ident.name()} — known: " +
          GraftProcedures.names.mkString(", ")))

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    GraftProcedures.names.map(Identifier.of(namespace, _)).toArray

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  /** ALTER TABLE … ADD/DROP CONSTRAINT parse only when the catalog
    * declares the capability. */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def spark = SparkSession.active
  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(new Path(warehouse))((p, n) => new Path(p, n))

  private def tableDir(ident: Identifier): Path =
    new Path(nsDir(ident.namespace), ident.name)

  private def isTable(p: Path): Boolean =
    fs.exists(new Path(p, "_manifests"))

  // ---- tables ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!fs.exists(d)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    fs.listStatus(d).collect {
      case st if st.isDirectory && isTable(st.getPath) =>
        Identifier.of(namespace, st.getPath.getName)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tableDir(ident))

  private def load(ident: Identifier, version: Option[Int],
      tsMicros: Option[Long]): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(
      (catalogName +: ident.namespace :+ ident.name).toSeq)
    val v = tsMicros match {
      case Some(us) =>
        Some(ManifestTable.versionAt(spark, dir.toString, us / 1000L))
      case None => version
    }
    val snap = ManifestTable.snapshot(spark, dir.toString, v)
    val schema = snap.schemaDdl.map(StructType.fromDDL).getOrElse(
      spark.read.parquet(snap.paths: _*).schema)
    new GraftManifestTable(dir.toString, snap.version, schema,
      snap.entries, snap.statsCol, snap.colMap, snap.checks)
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, None, None)

  /** SELECT ... VERSION AS OF <v>. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toInt), None)

  /** SELECT ... TIMESTAMP AS OF <ts> (Spark hands epoch MICROS). */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, None, Some(timestamp))

  /** CREATE TABLE … PARTITIONED BY (c, …): identity transforms become
    * the table's partition spec in the log — every later INSERT lays
    * files out one-partition-tuple-per-file and records the tuple in
    * the manifest, so partition pruning is exact from the commit log
    * alone. Bucket/days/etc. transforms are refused (identity is the
    * hive-layout contract this format keeps). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => throw new UnsupportedOperationException(
        s"graft-manifest supports identity partition transforms only, " +
          s"got $other")
    }
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(
      (catalogName +: ident.namespace :+ ident.name).toSeq)
    val statsCol = Option(properties.get("stats_col"))
    // write-time CDC capture is OPT-IN per table (Delta's
    // delta.enableChangeDataFeed shape): TBLPROPERTIES ('cdc'='true')
    val enableCdc = (Option(properties.get("cdc")) ++
        Option(properties.get("enableChangeDataFeed")))
      .exists(_.equalsIgnoreCase("true"))
    ManifestTable.createEmpty(spark, dir.toString, schema, statsCol,
      partCols, enableCdc)
    load(ident, None, None)
  }

  /** ALTER TABLE … ADD COLUMN(S) (schema-only evolution commit — old
    * files read back with the column null), RENAME COLUMN and DROP
    * COLUMN (pure METADATA commits through the column mapping: the
    * stored names in the data files never change, time travel shows
    * each version's own schema), and ALTER COLUMN … TYPE for LOSSLESS
    * widenings only (byte → short → int → long, float → double —
    * [[ManifestTable.widenColumn]]: the narrow-era files stay put and
    * readers upcast at scan time; Delta 3.x's typeWidening shape).
    * Any other type change stays refused: the log never coerces. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(
      (catalogName +: ident.namespace :+ ident.name).toSeq)
    def one(names: Array[String], what: String): String = {
      require(names.length == 1,
        s"ALTER TABLE $what supports top-level columns only")
      names.head
    }
    val adds = changes.flatMap {
      case a: TableChange.AddColumn =>
        Some(org.apache.spark.sql.types.StructField(
          one(a.fieldNames, "ADD COLUMN"), a.dataType, a.isNullable))
      case r: TableChange.RenameColumn =>
        ManifestTable.renameColumn(spark, dir.toString,
          one(r.fieldNames, "RENAME COLUMN"), r.newName)
        None
      case d: TableChange.DeleteColumn =>
        ManifestTable.dropColumn(spark, dir.toString,
          one(d.fieldNames, "DROP COLUMN"))
        None
      case a: TableChange.AddConstraint =>
        a.constraint match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            ManifestTable.addCheck(spark, dir.toString, c.name,
              c.predicateSql)
          case other => throw new UnsupportedOperationException(
            s"only CHECK constraints are supported, got $other — " +
              "PK/FK/UNIQUE are informational elsewhere; this engine " +
              "keeps only constraints it can ENFORCE")
        }
        None
      case u: TableChange.UpdateColumnType =>
        ManifestTable.widenColumn(spark, dir.toString,
          one(u.fieldNames, "ALTER COLUMN TYPE"), u.newDataType)
        None
      case d: TableChange.DropConstraint =>
        if (!d.ifExists ||
            ManifestTable.snapshot(spark, dir.toString).checks
              .contains(d.name))
          ManifestTable.dropCheck(spark, dir.toString, d.name)
        None
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE ${other.getClass.getSimpleName}: only ADD / " +
          "RENAME / DROP COLUMN, ALTER COLUMN TYPE (lossless " +
          "widenings), and ADD / DROP CONSTRAINT evolve the log " +
          "(the schema never otherwise coerces)")
    }
    if (adds.nonEmpty)
      ManifestTable.evolveSchema(spark, dir.toString,
        org.apache.spark.sql.types.StructType(adds))
    load(ident, None, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) false
    else fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!isTable(tableDir(oldIdent))) throw new NoSuchTableException(
      (catalogName +: oldIdent.namespace :+ oldIdent.name).toSeq)
    if (isTable(tableDir(newIdent))) throw new TableAlreadyExistsException(
      (catalogName +: newIdent.namespace :+ newIdent.name).toSeq)
    fs.mkdirs(nsDir(newIdent.namespace))
    if (!fs.rename(tableDir(oldIdent), tableDir(newIdent)))
      sys.error(s"rename ${oldIdent} -> ${newIdent} failed")
  }

  override def invalidateTable(ident: Identifier): Unit = ()

  // ---- namespaces (directories between warehouse and tables) ---------

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val d = nsDir(namespace)
    if (!fs.exists(d)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    fs.listStatus(d).collect {
      case st if st.isDirectory && !isTable(st.getPath) &&
          !st.getPath.getName.startsWith("_") =>
        namespace :+ st.getPath.getName
    }
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (namespace.nonEmpty && !fs.exists(nsDir(namespace)))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    fs.mkdirs(nsDir(namespace))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-manifest namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!fs.exists(d)) false
    else {
      if (!cascade && fs.listStatus(d).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(d, true)
    }
  }
}
