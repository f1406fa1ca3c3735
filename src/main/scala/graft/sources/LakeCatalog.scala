package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.Versioned

/** TableCatalog plugin: the lake through PURE SQL, including Spark's
  * native time-travel syntax.
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.lake", "graft.sources.LakeCatalog")
  * spark.sql("SELECT * FROM lake.`/data/events`")            // current
  * spark.sql("SELECT * FROM lake.`/data/events` VERSION AS OF 3")
  * spark.sql("SELECT * FROM lake.`/data/events` TIMESTAMP AS OF '…'")
  * }}}
  *
  * Identifiers are PATHS (the Delta `delta.`/path`` convention): a
  * backquoted absolute path resolves directly; with
  * `spark.sql.catalog.lake.root` set, a bare `lake.db.t` resolves to
  * `<root>/db/t`. `VERSION AS OF` lands on [[TableCatalog.loadTable]]'s
  * version overload and pins the manifest exactly like
  * [[Versioned.read]]'s version argument; `TIMESTAMP AS OF` resolves
  * through [[Versioned.versionAsOf]]. SQL writes are APPEND-ONLY:
  * `INSERT INTO` routes through [[Versioned.append]]'s commit
  * protocol (constraints, generated columns, identity allocation,
  * OCC); overwrites, row-level DML and DDL are refused — those
  * semantics belong to the engine's merge/delete primitives, never
  * to blind SQL that would bypass them. */
class LakeCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var root: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root"))
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    if (ident.name.startsWith("/") && ident.namespace.isEmpty) ident.name
    else root match {
      case Some(r) => (r +: ident.namespace :+ ident.name).mkString("/")
      case None => throw new IllegalArgumentException(
        s"catalog $catalogName has no root configured — use a " +
          s"backquoted absolute path: $catalogName.`/path/to/table`")
    }

  private def spark = SparkSession.active

  private def table(ident: Identifier, version: Option[Long]): Table = {
    val raw = pathOf(ident)
    // Iceberg-style metadata tables: `…$files` / `…$history`
    if (raw.endsWith("$files")) {
      val path = raw.stripSuffix("$files")
      require(Versioned.currentVersion(spark, path).isDefined,
        s"not a versioned lake table: $path")
      return new LakeFilesTable(path, version)
    }
    if (raw.endsWith("$history")) {
      val path = raw.stripSuffix("$history")
      require(Versioned.currentVersion(spark, path).isDefined,
        s"not a versioned lake table: $path")
      return new LakeHistoryTable(path)
    }
    val path = raw
    require(Versioned.currentVersion(spark, path).isDefined,
      s"not a versioned lake table: $path")
    val v = Versioned.resolveVersion(spark, path, version)
    val schema = Versioned.tableSchema(spark, path, Some(v)).getOrElse(
      Versioned.read(spark, path, Some(v)).schema)
    new LakeTable(path, version, schema, ignoreChanges = false)
  }

  override def loadTable(ident: Identifier): Table = table(ident, None)

  /** `VERSION AS OF <v>` */
  override def loadTable(ident: Identifier, version: String): Table =
    table(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF <ts>` (Spark hands micros since epoch). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    val v = Versioned.versionAsOf(spark, path, timestamp / 1000L)
      .getOrElse(throw new IllegalArgumentException(
        s"no version of $path existed at t=${timestamp / 1000L}ms"))
    table(ident, Some(v))
  }

  override def tableExists(ident: Identifier): Boolean =
    Versioned.currentVersion(spark, pathOf(ident)
      .stripSuffix("$files").stripSuffix("$history")).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] =
    root match {
      case None => Array.empty
      case Some(r) =>
        // through the path's OWN filesystem (hdfs/s3a/file all work),
        // not java.io.File, which would silently list nothing remote
        val dir = new org.apache.hadoop.fs.Path(
          (r +: namespace).mkString("/"))
        val fs = dir.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(dir)) Array.empty
        else fs.listStatus(dir)
          .filter(s => s.isDirectory && fs.exists(
            new org.apache.hadoop.fs.Path(s.getPath, "_versions")))
          .map(s => Identifier.of(namespace, s.getPath.getName))
    }

  /** Maintenance procedures: `CALL lake.optimize('/t', 4)` etc. —
    * see [[LakeProcedures]]. */
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    LakeProcedures.all.getOrElse(ident.name,
      throw new IllegalArgumentException(
        s"unknown procedure $catalogName.${ident.name} — available: " +
          LakeProcedures.all.keys.toSeq.sorted.mkString(", ")))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    LakeProcedures.all.keys.toSeq.sorted
      .map(Identifier.of(namespace, _)).toArray

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName is read-only: $op must go through the engine's " +
        "commit protocol (Versioned.init/merge/delete/…)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("RENAME TABLE")
}
