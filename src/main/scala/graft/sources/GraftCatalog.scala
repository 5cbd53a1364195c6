package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NonEmptyNamespaceException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-V2 CATALOG plugin — the API lakehouse formats
  * (Iceberg/Delta) register under `spark.sql.catalog.<name>`: a
  * filesystem warehouse where a namespace is a directory, a table is a
  * directory of Avro container files ([[AvroDirTable]] — so every
  * catalog table inherits the batch read/write + streaming-write
  * surface), and the table schema is persisted in a `_schema.json`
  * sidecar at CREATE time (the manifest's role: loadTable never
  * re-infers from data files, and an empty just-created table still
  * has a schema). SQL DDL/DML flows through the standard v2 plans:
  * CREATE/DROP NAMESPACE, CREATE TABLE AS SELECT (non-atomic
  * createTable + append — this catalog does not stage), INSERT INTO,
  * SELECT, DROP/RENAME TABLE.
  *
  * 100-TB note: the catalog IS the scale seam a real deployment swaps —
  * `T`'s schema-cache plays this role for the fixture tables; a
  * production engine points `spark.sql.catalog.*` at Iceberg/Delta and
  * every query in this library runs unchanged against governed tables.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: File = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
    warehouse = new File(wh)
    warehouse.mkdirs()
  }
  override def name(): String = catalogName

  private def nsDir(ns: Array[String]): File =
    ns.foldLeft(warehouse)((d, n) => new File(d, n))
  private def tableDir(ident: Identifier): File =
    new File(nsDir(ident.namespace), ident.name)
  private def schemaFile(dir: File): File = new File(dir, "_schema.json")
  private def isTable(dir: File): Boolean = schemaFile(dir).exists()
  private def deleteRec(f: File): Unit = graft.ops.GraftTmp.deleteRec(f)

  // ---- tables ----

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val d = nsDir(ns)
    if (!d.isDirectory) throw new NoSuchNamespaceException(ns)
    Option(d.listFiles).getOrElse(Array.empty).filter(isTable)
      .map(t => Identifier.of(ns, t.getName)).sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tableDir(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val json = new String(
      Files.readAllBytes(schemaFile(dir).toPath), StandardCharsets.UTF_8)
    new AvroDirTable(dir.getPath, DataType.fromJson(json).asInstanceOf[StructType])
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    if (!nsDir(ident.namespace).isDirectory)
      throw new NoSuchNamespaceException(ident.namespace)
    dir.mkdirs()
    Files.write(schemaFile(dir).toPath, schema.json.getBytes(StandardCharsets.UTF_8))
    new AvroDirTable(dir.getPath, schema)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) false else { deleteRec(dir); true }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = tableDir(from)
    if (!isTable(src)) throw new NoSuchTableException(from)
    val dst = tableDir(to)
    if (isTable(dst)) throw new TableAlreadyExistsException(to)
    if (!nsDir(to.namespace).isDirectory)
      throw new NoSuchNamespaceException(to.namespace)
    if (!src.renameTo(dst))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog tables are immutable-schema")

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] =
    Option(warehouse.listFiles).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !isTable(d))
      .map(d => Array(d.getName)).sortBy(_.head)

  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    if (ns.isEmpty) listNamespaces()
    else if (nsDir(ns).isDirectory) Array.empty
    else throw new NoSuchNamespaceException(ns)

  override def namespaceExists(ns: Array[String]): Boolean =
    nsDir(ns).isDirectory && !isTable(nsDir(ns))

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Map("location" -> nsDir(ns).getPath).asJava
  }

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(ns)) throw new NamespaceAlreadyExistsException(ns)
    nsDir(ns).mkdirs(); ()
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog namespaces carry no metadata")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(ns)
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    // ANY child — a table or a nested namespace — blocks a non-CASCADE
    // drop; counting only direct tables would let DROP NAMESPACE
    // silently destroy ns.sub.table.
    val children = Option(d.listFiles).getOrElse(Array.empty)
    if (children.nonEmpty && !cascade) throw new NonEmptyNamespaceException(ns)
    deleteRec(d); true
  }
}
