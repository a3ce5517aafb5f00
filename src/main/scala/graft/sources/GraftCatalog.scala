package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces,
  Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 catalog plugin exposing a testdata-layout directory tree as SQL
  * namespaces and tables — the third connector surface next to the
  * batch and micro-batch read paths of [[DocGenProvider]]:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /root/testdata
  *
  *   SELECT count(*) FROM graft.`sf0.01`.lineitem
  *   SHOW NAMESPACES IN graft
  * }}}
  *
  * Namespaces are the scale-factor subdirectories; tables are the
  * `<name>.parquet` files inside one. `loadTable` hands back Spark's
  * own V2 [[ParquetTable]] over the file, so every scan planned
  * through this catalog inherits the full parquet read stack —
  * vectorized reader, predicate pushdown, column pruning, partition
  * splits (GraftCatalogSpec asserts PushedFilters on a
  * catalog-resolved scan). The catalog itself is deliberately
  * READ-ONLY: the engine's write paths (CorpusSink, Ledger, JDBC) own
  * their own layouts, and a mutation through a path-backed catalog
  * would bypass their partitioning/bucketing contracts — create/alter/
  * drop all throw UnsupportedOperationException with that rationale.
  *
  * Registration is plain session conf, so a running session can mount
  * a tree lazily (catalogs resolve on first reference) — no extension
  * jar or restart; the catalog never touches the filesystem until a
  * namespace or table is actually resolved.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: java.io.File = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = new java.io.File(Option(options.get("root")).getOrElse("/root/testdata"))
  }

  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): java.io.File = namespace match {
    case Array(one) => new java.io.File(root, one)
    case _ => throw new NoSuchNamespaceException(namespace)
  }

  // ---- SupportsNamespaces ----------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(d => Array(d.getName)).sortBy(_.head)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // single-level tree
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && new java.io.File(root, namespace.head).isDirectory

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace))
      Map("location" -> nsDir(namespace).getAbsolutePath).asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = readOnly("CREATE NAMESPACE")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly("ALTER NAMESPACE")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = readOnly("DROP NAMESPACE")

  // ---- TableCatalog ----------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Option(nsDir(namespace).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => Identifier.of(namespace, f.getName.stripSuffix(".parquet")))
      .sortBy(_.name)
  }

  override def loadTable(ident: Identifier): Table = {
    val file = new java.io.File(nsDir(ident.namespace()), ident.name() + ".parquet")
    if (!file.exists()) throw new NoSuchTableException(ident)
    ParquetTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(file.getAbsolutePath),
      userSpecifiedSchema = None,
      fallbackFileFormat = classOf[ParquetFileFormat])
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 &&
      new java.io.File(nsDir(ident.namespace()), ident.name() + ".parquet").exists()

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op: graft catalog '$catalogName' is read-only — writes go through the " +
        "engine's owned sinks (CorpusSink / Ledger / JDBC), which control " +
        "partitioning and bucketing; a path-backed catalog write would bypass them")
}
