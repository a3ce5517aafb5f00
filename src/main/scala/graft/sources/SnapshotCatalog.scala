package graft.sources

import java.nio.file.Files
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException,
  NonEmptyNamespaceException, NoSuchNamespaceException, NoSuchTableException,
  TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  ProcedureCatalog, StagedTable, StagingTableCatalog, SupportsNamespaces,
  Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 catalog over [[SnapshotLog]] tables — the SQL surface of the
  * log, including TIME TRAVEL through Spark's own syntax:
  *
  * {{{
  *   spark.sql.catalog.snap      = graft.sources.SnapshotCatalog
  *   spark.sql.catalog.snap.root = /data/tables
  *
  *   SELECT * FROM snap.ns.events                    -- latest version
  *   SELECT * FROM snap.ns.events VERSION AS OF 3    -- exact version
  * }}}
  *
  * Namespaces are `root`'s subdirectories; a table is any directory
  * inside one carrying a `_log` (the log's own marker — nothing else
  * is trusted to be a table). `loadTable` resolves the manifest and
  * hands back Spark's own V2 [[ParquetTable]] over EXACTLY the
  * manifest's files with the manifest-recorded schema, so a
  * catalog-resolved scan inherits the full parquet stack (vectorized
  * reader, predicate pushdown, column pruning) while never listing a
  * data directory — the same reader guarantee as [[SnapshotLog.read]],
  * now reachable from SQL. `VERSION AS OF` maps to the DSv2
  * `loadTable(ident, version)` time-travel hook with EXACT-version
  * semantics (a missing or expired version is a loud error, matching
  * Delta — the `asOf` newest-at-or-before convenience stays a Scala
  * API affordance). `TIMESTAMP AS OF` resolves newest-at-or-before
  * against the MANIFEST-RECORDED commit timestamps (op/ts provenance
  * — copy/restore-stable, unlike the file mtimes that made this a
  * loud refusal pre-provenance); tables carrying any ts-less
  * pre-provenance version refuse loudly rather than guess an order.
  *
  * Writes reach ONLY the log's own commit paths — never a raw file
  * write: `INSERT INTO` routes to [[SnapshotLog.commitAppend]] and
  * `INSERT OVERWRITE` to [[SnapshotLog.commit]] through the table's
  * V1 write bridge ([[PrunedSnapshotTable.newWriteBuilder]]);
  * `DELETE`/`UPDATE`/`MERGE` route to the MOR verbs through the
  * [[SnapshotSqlDml]] extension rule; COLUMN DDL (`ALTER TABLE …
  * ADD/RENAME/DROP COLUMN`) and CHECK-CONSTRAINT DDL (`ALTER TABLE …
  * ADD CONSTRAINT c CHECK (…)` / `DROP CONSTRAINT`, `CREATE TABLE`
  * with inline CHECKs) delegate to the log's metadata-only commits
  * via [[alterTable]]/[[createTable]]; streaming INGEST reaches the
  * catalog as `writeStream.toTable` (a real V2 [[StreamingWrite]] —
  * [[SnapshotStreamingWrite]] — with the format sink's exactly-once
  * versioning). Everything the commit paths own —
  * put-if-absent OCC, stats, schema enforcement — holds for the SQL
  * verbs because they ARE the same paths. Table LIFECYCLE rides the
  * same discipline since round 17: `CREATE TABLE` publishes the log's
  * own schema-only genesis ([[SnapshotLog.createTable]]); CTAS, RTAS,
  * and `[CREATE OR] REPLACE TABLE` are STAGED (this catalog is a
  * [[StagingTableCatalog]]) — data files land with no manifest, one
  * atomic commit makes the statement real, and REPLACE PRESERVES
  * HISTORY as a fresh generation at `latest+1`
  * ([[SnapshotLog.replaceTableFiles]]) instead of Spark's non-staging
  * drop+create fallback destroying every version; `DROP TABLE` deletes
  * exactly one `_log`-bearing directory, `ALTER TABLE … RENAME TO`
  * routes to [[SnapshotLog.rehome]] (one atomic directory move plus
  * the manifest path-prefix rewrite — manifests record canonical
  * absolute paths, so a bare `mv` would strand them; exclusive-access,
  * like a filesystem `mv`), and namespaces are plain directories
  * (`CREATE NAMESPACE` = mkdir; `DROP NAMESPACE` only when empty —
  * CASCADE stays refused: bulk table destruction remains a deliberate
  * per-table act).
  *
  * MAINTENANCE is SQL-reachable through DSv2 procedures (Spark 4's
  * `CALL` statement), namespaced `system` by the Iceberg convention:
  *
  * {{{
  *   CALL snap.system.restore(table => 'ns.t', version => 3)
  *   CALL snap.system.optimize('ns.t', 500000)
  *   CALL snap.system.expire_versions('ns.t', 10)
  *   CALL snap.system.vacuum('ns.t')
  *   CALL snap.system.compact_deletes('ns.t')
  * }}}
  *
  * each routing to the log's own verb (see [[SnapshotProcedures]]).
  */
class SnapshotCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var root: java.io.File = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = new java.io.File(Option(options.get("root")).getOrElse(
      sys.error(s"spark.sql.catalog.$name.root is required")))
  }

  override def name(): String = catalogName

  /** Constraint DDL is analyzer-gated on this declaration: without it
    * Spark refuses `ADD CONSTRAINT` / `CREATE TABLE (… CHECK …)`
    * before the catalog ever sees the change. Only CHECK constraints
    * actually land (see [[alterTable]]) — the capability opts into the
    * SYNTAX, the per-change handling enforces the semantics. */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def nsDir(namespace: Array[String]): java.io.File = namespace match {
    case Array(one) => new java.io.File(root, one)
    case _ => throw new NoSuchNamespaceException(namespace)
  }

  private def tableDir(ident: Identifier): java.io.File =
    new java.io.File(nsDir(ident.namespace()), ident.name())

  private def isTable(dir: java.io.File): Boolean =
    new java.io.File(dir, "_log").isDirectory

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

  /** `CREATE NAMESPACE` — a namespace IS a directory under root, so
    * creating one is mkdir. Properties other than Spark's own
    * bookkeeping (`owner`) refuse: a location or comment the directory
    * can't record would be silently lost. */
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1,
      s"namespace ${namespace.mkString(".")}: the catalog's namespace " +
        "tree is single-level (root's subdirectories)")
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    val unsupported = metadata.asScala.keys.filterNot(_ == "owner")
    require(unsupported.isEmpty,
      s"CREATE NAMESPACE: propert${if (unsupported.size == 1) "y" else "ies"} " +
        s"${unsupported.mkString(", ")} — a namespace is a plain " +
        "directory and records no metadata")
    Files.createDirectories(nsDir(namespace).toPath): Unit
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly("ALTER NAMESPACE")

  /** `DROP NAMESPACE` — only when EMPTY. CASCADE stays refused: it is
    * bulk table destruction in one statement, and the catalog keeps
    * that a deliberate per-table `DROP TABLE` act. */
  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    require(!cascade,
      s"DROP NAMESPACE ${namespace.mkString(".")} CASCADE: refused — " +
        "dropping every table in a namespace in one statement stays a " +
        "deliberate per-table act (DROP TABLE each, then drop the " +
        "empty namespace)")
    val dir = nsDir(namespace)
    if (Option(dir.listFiles()).exists(_.nonEmpty))
      throw new NonEmptyNamespaceException(namespace)
    Files.delete(dir.toPath)
    true
  }

  // ---- TableCatalog ----------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Option(nsDir(namespace).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && isTable(d))
      .map(d => Identifier.of(namespace, d.getName))
      .sortBy(_.name)
  }

  private def parquetTable(ident: Identifier, v: Long,
      writable: Boolean = false): Table = {
    val t = tableDir(ident).getAbsolutePath
    val (files, stats, schema, colmap, dv) = SnapshotLog.manifestDetailsAt(t, v)
    def refuse(why: String): Nothing = sys.error(
      s"table ${ident.namespace().mkString(".")}.${ident.name()} at " +
        s"version $v carries merge-on-read deletion vectors $why — " +
        "materialize them first with SnapshotLog.compactDeletes(tableDir), " +
        "or read via SnapshotLog.read")
    if (dv.nonEmpty) {
      // a dv-bearing version READS through SQL since round 16: the
      // pruning scan splits the file list into a clean half (the
      // ordinary parquet stack) and a masked half — one partition per
      // masked file, whose deleted positions materialize ON THE
      // EXECUTOR from the sidecar paths the partition carries (see
      // PrunedSnapshotScan / DvMaskingReaderFactory), so nothing
      // mask-sized ever collects to the driver and masks of ANY size
      // read. PROTOCOL GATING remains only for a pre-schema manifest
      // (the pruning wrapper needs the recorded schema); over-answering
      // — resurrecting deleted rows — stays the one unacceptable
      // outcome, so that shape refuses loudly
      if (schema.isEmpty) refuse("on a pre-schema manifest, which the " +
        "masked SQL scan cannot serve")
    }
    val tName =
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}@v$v"
    // a renamed/dropped table ([[SnapshotLog.renameColumn]]) reads its
    // files under immutable PHYSICAL names: hand the parquet stack the
    // physical schema and wrap the table so SQL sees logical names —
    // rows are positional, so only the two schema boundaries translate
    schema match {
      // schema-recorded tables — identity or column-mapped: SQL scans
      // file-prune at planning (manifest stats + bloom indexes) through
      // the bridge ScanBuilder, then run the ordinary parquet stack
      // over the kept files (mapped tables additionally translate at
      // the two name boundaries — see PrunedSnapshotTable)
      case Some(sch) =>
        new PrunedSnapshotTable(tName, t, v, files, stats, sch, colmap, dv,
          writable)
      // pre-schema manifests (no stats either, never mapped, dv
      // refused above): the plain scan — READ-ONLY-wrapped, because
      // ParquetTable itself advertises BATCH_WRITE and an INSERT would
      // drop files straight into the data directory, invisible to
      // every manifest-driven reader (a write the log never saw)
      case None => new ReadOnlySnapshotTable(ParquetTable(
        tName,
        SparkSession.active,
        CaseInsensitiveStringMap.empty(),
        files,
        userSpecifiedSchema = None,
        fallbackFileFormat = classOf[ParquetFileFormat]))
    }
  }

  override def loadTable(ident: Identifier): Table = {
    // the Iceberg-convention METADATA TABLE: `SELECT * FROM
    // cat.ns.t.history` parses as Identifier(namespace = [ns, t],
    // name = "history") — surface [[SnapshotLog.history]]'s full
    // version provenance to SQL (DESCRIBE TABLE EXTENDED only shows
    // the latest op). A REAL table named `history` is unaffected: its
    // identifier has a single-level namespace.
    if (ident.namespace().length == 2 &&
        ident.name().equalsIgnoreCase("history")) {
      val inner = Identifier.of(Array(ident.namespace()(0)),
        ident.namespace()(1))
      val dir = tableDir(inner)
      if (dir.isDirectory && isTable(dir))
        return new SnapshotHistoryTable(
          s"$catalogName.${ident.namespace().mkString(".")}.history",
          dir.getAbsolutePath)
    }
    // `snap.ns.t.files` — the latest manifest's per-file inventory
    // (Iceberg's files metadata table at this log's minimum)
    if (ident.namespace().length == 2 &&
        ident.name().equalsIgnoreCase("files")) {
      val inner = Identifier.of(Array(ident.namespace()(0)),
        ident.namespace()(1))
      val dir = tableDir(inner)
      if (dir.isDirectory && isTable(dir))
        return new SnapshotFilesTable(
          s"$catalogName.${ident.namespace().mkString(".")}.files",
          dir.getAbsolutePath)
    }
    // `snap.ns.t.changes` — the change data feed as a metadata table
    // (batch + streaming; see [[SnapshotChangesTable]])
    if (ident.namespace().length == 2 &&
        ident.name().equalsIgnoreCase("changes")) {
      val inner = Identifier.of(Array(ident.namespace()(0)),
        ident.namespace()(1))
      val dir = tableDir(inner)
      if (dir.isDirectory && isTable(dir))
        return new SnapshotChangesTable(
          s"$catalogName.${ident.namespace().mkString(".")}.changes",
          dir.getAbsolutePath)
    }
    val dir = tableDir(ident)
    if (!dir.isDirectory || !isTable(dir)) throw new NoSuchTableException(ident)
    val latest = SnapshotLog.latestVersion(dir.getAbsolutePath)
      .getOrElse(throw new NoSuchTableException(ident))
    // only the latest-version load is a DML target: the verbs commit
    // on top of latest, so a time-travel pin must stay read-only
    parquetTable(ident, latest, writable = true)
  }

  /** `VERSION AS OF <v>` — exact-version time travel. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!dir.isDirectory || !isTable(dir)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"VERSION AS OF wants the numeric snapshot version, got '$version'")
    }
    parquetTable(ident, v)
  }

  /** `TIMESTAMP AS OF <t>` — time travel by the MANIFEST-RECORDED
    * commit timestamps (round 15's op/ts provenance; recorded inside
    * the manifest, so a copy/restore preserves history — the reason
    * this was refused pre-provenance, when only file mtimes existed,
    * no longer holds). Resolves to the newest version committed at or
    * before `t` (Delta's semantics). Two loud edges: a table with any
    * PRE-PROVENANCE manifest (ts-less versions cannot be time-ordered
    * — use VERSION AS OF), and a `t` before the first commit.
    * Commit timestamps are committer wall-clock: under clock skew
    * (history momentarily non-monotonic) the resolution still picks
    * the NEWEST version whose recorded ts is at or before `t` —
    * version order, the log's real clock, breaks the tie. The DSv2
    * contract hands `timestamp` in MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    if (!dir.isDirectory || !isTable(dir)) throw new NoSuchTableException(ident)
    val entries = SnapshotLog.history(dir.getAbsolutePath)
    if (entries.isEmpty) throw new NoSuchTableException(ident)
    val unstamped = entries.filter(_.tsMillis <= 0L)
    if (unstamped.nonEmpty) sys.error(
      s"TIMESTAMP AS OF: version(s) ${unstamped.map(_.version).sorted
        .mkString(", ")} of ${ident.namespace().mkString(".")}." +
        s"${ident.name()} predate commit-timestamp provenance and cannot " +
        "be time-ordered — use VERSION AS OF <n>")
    val askedMillis = timestamp / 1000L
    val at = entries.filter(_.tsMillis <= askedMillis)
    if (at.isEmpty) sys.error(
      s"TIMESTAMP AS OF: no version of ${ident.namespace().mkString(".")}" +
        s".${ident.name()} was committed at or before " +
        s"${java.time.Instant.ofEpochMilli(askedMillis)} (first commit: " +
        s"${java.time.Instant.ofEpochMilli(entries.map(_.tsMillis).min)})")
    parquetTable(ident, at.maxBy(_.version).version)
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 && isTable(tableDir(ident))

  /** `CREATE TABLE snap.ns.t (…)` — the log's schema-only GENESIS
    * ([[SnapshotLog.createTable]]: version 0, zero data files, the
    * schema recorded all-nullable per SQL's convention). CTAS is this
    * genesis plus Spark's own follow-up INSERT through the table's V1
    * write bridge, so CTAS data lands via `commitAppend` with full
    * schema enforcement (and Spark drops the half-made table if the
    * write fails — the manifest the genesis published just orphans
    * with the directory). Refused shapes, loudly: PARTITIONED BY (the
    * log's layout story is `optimize`'s clustering / z-order, not
    * hive-style directory partitioning), LOCATION/EXTERNAL (tables
    * live under the catalog root — that is what makes them this
    * catalog's tables), any provider but parquet, and table
    * properties/comments the manifest doesn't record. */
  /** The CREATE/REPLACE shape gate, shared by [[createTable]] and the
    * three staged verbs: no hive partitioning, parquet-only provider,
    * no properties the manifest can't record. */
  private def vetCreateShape(verb: String, ident: Identifier,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Unit = {
    require(partitions.isEmpty,
      s"$verb ${ident.name()} PARTITIONED BY: the snapshot log " +
        "does not do hive-style directory partitioning — its layout " +
        "story is optimize(clusterBy/zOrderBy) plus manifest-stats file " +
        "pruning, which serves the same skipping without small-file " +
        "explosion")
    val props = properties.asScala
    props.get(TableCatalog.PROP_PROVIDER).foreach(p =>
      require(p.equalsIgnoreCase("parquet"),
        s"$verb ${ident.name()} USING $p: snapshot tables are " +
          "parquet (omit USING, or say USING parquet)"))
    val unsupported = props.keys.filterNot(k =>
      k == TableCatalog.PROP_PROVIDER || k == TableCatalog.PROP_OWNER)
    require(unsupported.isEmpty,
      s"$verb ${ident.name()}: unsupported " +
        s"propert${if (unsupported.size == 1) "y" else "ies"} " +
        s"${unsupported.mkString(", ")} — the manifest records schema, " +
        "stats, and provenance; LOCATION, COMMENT, and TBLPROPERTIES " +
        "have nowhere to live")
  }

  /** Constraint vetting for CREATE/REPLACE definitions: enforced CHECK
    * only, returned as (name, predicate SQL) for the log's dotfiles. */
  private def vetChecks(verb: String, ident: Identifier,
      cs: Array[org.apache.spark.sql.connector.catalog.constraints.Constraint])
      : Seq[(String, String)] =
    cs.toSeq.map {
      case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
        require(c.enforced(),
          s"$verb ${ident.name()} CONSTRAINT ${c.name()} NOT " +
            "ENFORCED: the log's constraints are write guards — it " +
            "does not record informational constraints")
        c.name() -> Option(c.predicateSql()).filter(_.nonEmpty).getOrElse(
          sys.error(s"CONSTRAINT ${c.name()}: no predicate SQL text"))
      case other =>
        throw new UnsupportedOperationException(
          s"$verb ${ident.name()} CONSTRAINT ${other.name()} " +
            s"(${other.getClass.getSimpleName}): only CHECK constraints " +
            "— PRIMARY KEY / UNIQUE / FOREIGN KEY are unenforceable " +
            "at scale and this log refuses to record guards it cannot " +
            "enforce")
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace())
    vetCreateShape("CREATE TABLE", ident, partitions, properties)
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    SnapshotLog.createTable(dir.getAbsolutePath, schema): Unit
    loadTable(ident)
  }

  /** `CREATE TABLE (…, CONSTRAINT c CHECK (…))` — the [[TableInfo]]
    * overload Spark calls when the statement carries constraints (the
    * default implementation would DROP them silently). Every
    * constraint is vetted FIRST (enforced CHECK only — the same rules
    * as [[alterTable]]'s ADD CONSTRAINT), then the genesis publishes
    * and each constraint lands as the log's own dotfile; validation
    * over the empty genesis passes trivially, so a mid-way failure is
    * impossible once vetting is through. */
  override def createTable(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): Table = {
    val cs = info.constraints()
    if (cs.isEmpty)
      return createTable(ident, info.schema(), info.partitions(),
        info.properties())
    val checks = vetChecks("CREATE TABLE", ident, cs)
    createTable(ident, info.schema(), info.partitions(),
      info.properties()): Unit
    val spark = SparkSession.active
    checks.foreach { case (n, sql) =>
      SnapshotLog.addConstraint(spark, tableDir(ident).getAbsolutePath, n, sql)
    }
    loadTable(ident) // re-load so the returned Table reports its constraints
  }

  // ---- StagingTableCatalog ----------------------------------------------
  //
  // Why stage at all: for a non-staging catalog Spark plans REPLACE
  // TABLE [AS SELECT] as dropTable + createTable — and this catalog's
  // dropTable DELETES THE DIRECTORY, so a statement that asked to
  // replace a table's CONTENT would destroy every committed version,
  // every time-travel read, the whole history. Staging turns all three
  // statements (CTAS, RTAS, REPLACE) into ONE log commit:
  //
  //  - the staged table's write bridge lands data files under the
  //    table's data/ directory with NO manifest — nothing can read
  //    them, a crash orphans them for vacuum/abort;
  //  - commitStagedChanges publishes exactly one manifest — v0 with
  //    its files for CTAS (op "create-table"), latest+1 with the new
  //    generation for replace (op "replace-table", history intact —
  //    see SnapshotLog.replaceTableFiles for the isolation argument);
  //  - abortStagedChanges deletes the staged files.
  //
  // REPLACE swaps CHECK constraints (the old definition's guards die
  // with it — Delta's semantics), pre-validating the new definition's
  // constraints against the staged content BEFORE publishing, so a
  // violating replace refuses with the old table (and its guards)
  // fully intact.

  override def stageCreate(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable = {
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace())
    vetCreateShape("CREATE TABLE", ident, info.partitions(), info.properties())
    if (isTable(tableDir(ident))) throw new TableAlreadyExistsException(ident)
    new SnapshotStagedTable(this, ident, tableDir(ident), info.schema(),
      SnapshotStagedTable.Create,
      vetChecks("CREATE TABLE", ident, info.constraints()))
  }

  override def stageReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable = {
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace())
    vetCreateShape("REPLACE TABLE", ident, info.partitions(),
      info.properties())
    if (!isTable(tableDir(ident))) throw new NoSuchTableException(ident)
    new SnapshotStagedTable(this, ident, tableDir(ident), info.schema(),
      SnapshotStagedTable.Replace,
      vetChecks("REPLACE TABLE", ident, info.constraints()))
  }

  override def stageCreateOrReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable = {
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace())
    vetCreateShape("CREATE OR REPLACE TABLE", ident, info.partitions(),
      info.properties())
    new SnapshotStagedTable(this, ident, tableDir(ident), info.schema(),
      SnapshotStagedTable.CreateOrReplace,
      vetChecks("CREATE OR REPLACE TABLE", ident, info.constraints()))
  }

  private[sources] def stagedTableExists(dir: java.io.File): Boolean =
    isTable(dir)

  /** The one write surface the catalog exposes: COLUMN DDL — and only
    * because it delegates to the log's OWN metadata-only commit paths
    * ([[SnapshotLog.addColumn]]/[[SnapshotLog.renameColumn]]/
    * [[SnapshotLog.dropColumn]]), so nothing the read-only rationale
    * protects (atomicity, stats, schema enforcement) is bypassed —
    * these ARE the owned paths, reached from SQL:
    *
    * {{{
    *   ALTER TABLE snap.ns.t ADD COLUMN note STRING
    *   ALTER TABLE snap.ns.t RENAME COLUMN src TO source
    *   ALTER TABLE snap.ns.t DROP COLUMN payload
    * }}}
    *
    * Each change publishes its own version (put-if-absent — concurrent
    * writers conflict as usual), so a multi-change statement that
    * crashes mid-way leaves a valid PREFIX, never a torn manifest.
    * Top-level columns only (the log's mapping is top-level-only, like
    * stats and evolution); ADD takes no FIRST/AFTER position (columns
    * append at the end, where every old file null-fills) and must be
    * nullable (existing rows have no value to give a NOT NULL column).
    * Everything else ALTER TABLE can say stays read-only-rejected. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!dir.isDirectory || !isTable(dir)) throw new NoSuchTableException(ident)
    val t = dir.getAbsolutePath
    def topLevel(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"$what: nested field '${fieldNames.mkString(".")}' — the " +
          "snapshot log's column DDL is top-level-only, like its " +
          "stats and evolution")
      fieldNames.head
    }
    changes.foreach {
      case ac: TableChange.AddColumn =>
        val name = topLevel(ac.fieldNames(), "ADD COLUMN")
        require(ac.isNullable,
          s"ADD COLUMN $name: must be nullable — existing rows have " +
            "no value to give a NOT NULL column")
        require(ac.position() == null,
          s"ADD COLUMN $name: FIRST/AFTER positions are unsupported — " +
            "columns append at the end, where every old file null-fills")
        SnapshotLog.addColumn(t, name, ac.dataType())
      case rc: TableChange.RenameColumn =>
        SnapshotLog.renameColumn(t,
          topLevel(rc.fieldNames(), "RENAME COLUMN"), rc.newName())
      case dc: TableChange.DeleteColumn =>
        val name = topLevel(dc.fieldNames(), "DROP COLUMN")
        // DROP COLUMN IF EXISTS on an absent column is a no-op, not an
        // error — check the CURRENT logical schema (each prior change in
        // this statement already published its own version). The
        // short-circuit requires a RECORDED schema that provably lacks
        // the column: a pre-schema manifest can't prove absence, so it
        // falls through to dropColumn's loud re-commit-to-record error
        // (same as the plain DROP path)
        val absent = dc.ifExists() && {
          val latest = SnapshotLog.latestVersion(t).getOrElse(
            throw new NoSuchTableException(ident))
          val (_, _, schemaOpt, _, _) = SnapshotLog.manifestDetailsAt(t, latest)
          schemaOpt.exists(s => !s.fieldNames.contains(name))
        }
        if (!absent) SnapshotLog.dropColumn(t, name): Unit
      case ac: TableChange.AddConstraint =>
        ac.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            require(c.enforced(),
              s"ADD CONSTRAINT ${c.name()} … NOT ENFORCED: the snapshot " +
                "log's constraints are WRITE GUARDS (every row-creating " +
                "verb checks them) — it does not record informational " +
                "constraints it will not enforce")
            val sql = Option(c.predicateSql()).filter(_.nonEmpty).getOrElse(
              sys.error(s"ADD CONSTRAINT ${c.name()}: no predicate SQL " +
                "text on the CHECK constraint"))
            // the log's own add: validates the EXISTING data first
            // (Delta's rule), then one put-if-absent dotfile — the same
            // path CALL snap.system.add_constraint takes
            SnapshotLog.addConstraint(SparkSession.active, t, c.name(), sql)
          case other =>
            throw new UnsupportedOperationException(
              s"ADD CONSTRAINT ${other.name()} " +
                s"(${other.getClass.getSimpleName}): only CHECK " +
                "constraints — PRIMARY KEY / UNIQUE / FOREIGN KEY are " +
                "informational in every lakehouse (nothing enforces them " +
                "at scale without a global index), and this log refuses " +
                "to record a guard it cannot enforce")
        }
      case dcn: TableChange.DropConstraint =>
        // RESTRICT vs CASCADE is vacuous here — constraints have no
        // dependent objects in this catalog — so both modes accept
        val absent = dcn.ifExists() &&
          !SnapshotLog.constraints(t).exists(_._1 == dcn.name())
        if (!absent) SnapshotLog.dropConstraint(t, dcn.name())
      case other =>
        readOnly(s"ALTER TABLE (${other.getClass.getSimpleName})")
    }
    loadTable(ident)
  }

  /** `DROP TABLE` — recursive delete of exactly one `_log`-bearing
    * directory (the marker check is the guard: a directory the log
    * never wrote is never deleted through this catalog, whatever its
    * name looks like). Returns false for a non-table, which Spark
    * turns into the usual no-such-table handling (IF EXISTS
    * swallows it). */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (ident.namespace().length != 1 || !isTable(dir)) return false
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory && !Files.isSymbolicLink(f.toPath))
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      Files.deleteIfExists(f.toPath): Unit
    }
    rm(dir)
    true
  }

  /** `ALTER TABLE snap.ns.a RENAME TO ns.b` →
    * [[SnapshotLog.rehome]]: one atomic directory move plus the
    * manifest path-prefix rewrite (manifests record canonical absolute
    * paths). Exclusive-access, like a filesystem `mv` — documented at
    * the verb. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val src = tableDir(oldIdent)
    if (!isTable(src)) throw new NoSuchTableException(oldIdent)
    if (!namespaceExists(newIdent.namespace()))
      throw new NoSuchNamespaceException(newIdent.namespace())
    val dst = tableDir(newIdent)
    if (isTable(dst)) throw new TableAlreadyExistsException(newIdent)
    SnapshotLog.rehome(SparkSession.active, src.getAbsolutePath,
      dst.getAbsolutePath)
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op: unsupported by snapshot catalog '$catalogName' — supported " +
        "surfaces are reads (time travel included), DML " +
        "(INSERT/DELETE/UPDATE/MERGE), column DDL (ADD/RENAME/DROP " +
        "COLUMN), CHECK constraint DDL (ADD/DROP CONSTRAINT), table " +
        "lifecycle (CREATE/CTAS/DROP/RENAME TABLE, CREATE/DROP " +
        "NAMESPACE), and CALL snap.system.* maintenance procedures; " +
        "each routes to the log's own commit paths")

  // ---- FunctionCatalog ---------------------------------------------------

  /** One function: `bucket` — the identity storage-partitioned joins
    * resolve a bucketed scan's `KeyGroupedPartitioning(bucket(n, col))`
    * through (V2ExpressionUtils loads it as `Identifier.of(empty,
    * "bucket")` against the TABLE's catalog). See
    * [[GraftBucketFunction]] for the arithmetic and why the canonical
    * name carries the input type. */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket") && ident.namespace().isEmpty)
      GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  // ---- ProcedureCatalog --------------------------------------------------

  /** Maintenance verbs as SQL `CALL` procedures (Spark 4's DSv2
    * stored-procedure surface), namespaced `system` by the Iceberg
    * convention. Each binds its table argument against THIS catalog's
    * root and routes to the log's own verb — see [[SnapshotProcedures]]
    * for the inventory and the argument contract. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"CALL ${ident.namespace().mkString(".")}.${ident.name()}: " +
        s"procedures live in the 'system' namespace — CALL $catalogName" +
        s".system.${ident.name()}(…)")
    SnapshotProcedures.load(this, ident.name()).getOrElse(sys.error(
      s"no procedure '${ident.name()}' — available: " +
        SnapshotProcedures.names.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(Array("system"))) Array.empty
    else SnapshotProcedures.names
      .map(n => Identifier.of(Array("system"), n)).toArray

  /** A procedure's `table` argument resolved against this catalog:
    * `ns.t` under root, or an absolute path (path-addressed tables,
    * the TVF convention). */
  private[sources] def resolveTableArg(table: String): String = {
    val dir =
      if (table.startsWith("/")) new java.io.File(table)
      else table.split('.') match {
        case Array(ns, t) => new java.io.File(new java.io.File(root, ns), t)
        case _ => sys.error(
          s"table '$table': expected 'namespace.table' (resolved under " +
            s"this catalog's root) or an absolute path")
      }
    require(isTable(dir),
      s"table '$table': ${dir.getAbsolutePath} is not a snapshot table " +
        "(no _log)")
    dir.getAbsolutePath
  }
}

private object SnapshotStagedTable {
  sealed trait Mode
  case object Create extends Mode          // CREATE TABLE … AS SELECT
  case object Replace extends Mode         // REPLACE TABLE [AS SELECT]
  case object CreateOrReplace extends Mode // CREATE OR REPLACE TABLE …
}

/** The staged half of CTAS / RTAS / REPLACE TABLE (see the
  * StagingTableCatalog section of [[SnapshotCatalog]] for why this
  * exists): Spark writes the SELECT's rows through this table's write
  * bridge — files land under `data/staged-<uuid>` with NO manifest, so
  * nothing can read them and a crash orphans them — then calls
  * [[commitStagedChanges]], which publishes the ONE manifest that
  * makes the statement real ([[SnapshotLog.createTableFiles]] /
  * [[SnapshotLog.replaceTableFiles]]) and swaps CHECK constraint
  * dotfiles for the replace forms. The plain `REPLACE TABLE` DDL form
  * never writes — zero staged files publish as an empty new
  * generation, the analog of the schema-only genesis.
  *
  * The write bridge is the same V1 [[InsertableRelation]] shape as the
  * live table's ([[PrunedSnapshotTable.newWriteBuilder]]) — the data
  * write is Spark's distributed parquet writer, nothing row-sized
  * touches the driver; the difference is only WHEN the manifest
  * appears. `SupportsTruncate` is accepted and ignored: RTAS plans its
  * write as overwrite-by-true, but the whole staged operation IS the
  * replacement — there is no previous generation inside the staging
  * directory to clear. */
private class SnapshotStagedTable(catalog: SnapshotCatalog,
    ident: Identifier, dir: java.io.File, declared: StructType,
    mode: SnapshotStagedTable.Mode, checks: Seq[(String, String)])
    extends StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  private val fullName =
    s"${catalog.name()}.${ident.namespace().mkString(".")}.${ident.name()}"
  // one staging area per staged statement; writer-unique like every
  // data directory the log writes
  private val stagingDir = new java.io.File(new java.io.File(dir, "data"),
    s"staged-${java.util.UUID.randomUUID.toString.take(8)}")
  @volatile private var stagedFiles: Seq[String] = Nil
  @volatile private var stagedSpark: SparkSession = _

  override def name(): String = s"$fullName (staged)"
  override def schema(): StructType = declared
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCapability] = {
    import org.apache.spark.sql.connector.catalog.TableCapability._
    util.EnumSet.of(V1_BATCH_WRITE, TRUNCATE)
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder =
        this // RTAS overwrite-by-true; the staged commit IS the replace
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
              data.write.mode("overwrite").parquet(stagingDir.getPath)
              stagedSpark = data.sparkSession
              stagedFiles = Option(stagingDir.listFiles())
                .getOrElse(Array.empty).toSeq
                .filter(_.getName.endsWith(".parquet"))
                .map(_.toPath.toAbsolutePath.normalize.toString).sorted
            }
        }
    }

  override def commitStagedChanges(): Unit = {
    val spark = Option(stagedSpark).getOrElse(SparkSession.active)
    val t = dir.getAbsolutePath
    val replacing = mode match {
      case SnapshotStagedTable.Create => false
      case SnapshotStagedTable.Replace => true
      case SnapshotStagedTable.CreateOrReplace => catalog.stagedTableExists(dir)
    }
    // the new definition's constraints gate the staged content BEFORE
    // any manifest exists — a violating CREATE/REPLACE refuses with
    // the previous state (old table, old guards) fully intact
    if (checks.nonEmpty && stagedFiles.nonEmpty) {
      val staged = spark.read.parquet(stagedFiles: _*)
        .toDF(declared.fieldNames.toSeq: _*)
      SnapshotLog.firstViolation(staged, checks).foreach(v => sys.error(
        s"${if (replacing) "REPLACE" else "CREATE"} TABLE $fullName " +
          s"refused: $v (the definition's own CHECK constraints gate " +
          "its data; nothing was published)"))
    }
    if (replacing) {
      SnapshotLog.replaceTableFiles(spark, t, declared, stagedFiles): Unit
      // REPLACE redefines the table: the old definition's guards die
      // with it (Delta's semantics), the new definition's take over
      SnapshotLog.constraints(t).foreach { case (n, _) =>
        SnapshotLog.dropConstraint(t, n) }
    } else {
      SnapshotLog.createTableFiles(spark, t, declared, stagedFiles): Unit
    }
    checks.foreach { case (n, sql) =>
      SnapshotLog.addConstraintUnchecked(t, n, sql) }
  }

  override def abortStagedChanges(): Unit = {
    // staged files were never referenced by any manifest — delete them
    // and the staging directory; on an aborted CREATE the directory
    // has no _log, and Spark's exec additionally dropTable()s it
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      Files.deleteIfExists(f.toPath): Unit
    }
    rm(stagingDir)
  }

  override def toString: String = name()
}

/** `DESCRIBE HISTORY` as a SQL-queryable metadata table (the
  * Delta/Iceberg convention, Iceberg's spelling):
  *
  * {{{
  *   SELECT version, operation FROM snap.ns.t.history ORDER BY version
  * }}}
  *
  * One row per SURVIVING manifest ([[SnapshotLog.history]] — expired
  * versions are absent, the same contiguous-suffix shape every reader
  * sees), newest first before any ORDER BY: version, the publishing
  * verb, its commit timestamp (null on pre-provenance manifests),
  * and the manifest's file / dv-sidecar counts. Served as a
  * [[org.apache.spark.sql.connector.read.LocalScan]]: history is
  * driver-sized metadata (one small JSON per version, already read on
  * the driver), so shipping it through input partitions would
  * manufacture distribution for data that never leaves the driver —
  * Spark plans it as a LocalTableScan. Rows re-read per query plan,
  * so a feed sees commits as they land. */
private class SnapshotHistoryTable(tName: String, tableDirPath: String)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.types._

  private val historySchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("files", IntegerType, nullable = false),
    StructField("dv_files", IntegerType, nullable = false)))

  override def name(): String = tName
  override def schema(): StructType = historySchema
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.Scan
        with org.apache.spark.sql.connector.read.LocalScan {
      override def readSchema(): StructType = historySchema
      override def description(): String = tName
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
        SnapshotLog.history(tableDirPath).map { e =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](
              e.version,
              org.apache.spark.unsafe.types.UTF8String.fromString(e.op),
              // provenance millis → catalyst micros; 0 = pre-provenance
              if (e.tsMillis <= 0L) null else e.tsMillis * 1000L,
              e.files,
              e.dvFiles)): org.apache.spark.sql.catalyst.InternalRow
        }.toArray
    }
}

/** `snap.ns.t.files` — the LATEST manifest's per-file inventory as a
  * SQL metadata table (Iceberg's `files` table at this log's
  * minimum), manifest-only by design: one row per data file with its
  * deletion-mask state and the recorded column stats as a JSON
  * string (`get_json_object(stats, '$.col.min')` digs in — the stats
  * vocabulary is per-column `min`/`max`/`nulls`/`allNull`, keyed by
  * PHYSICAL column name). `rows` is the manifest-recorded footer row
  * count (the `:rows` pseudo-stat — null for files committed before
  * it was harvested); no other counts are re-derived: a metadata
  * query that re-reads every footer would be O(files) driver I/O on
  * a table whose whole point is not listing files. Served as a
  * LocalScan like [[SnapshotHistoryTable]] — driver-sized metadata,
  * re-read per plan. */
private class SnapshotFilesTable(tName: String, tableDirPath: String)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.types._

  private val filesSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("rows", LongType, nullable = true),
    // rows minus the exact :masked cardinality (null when either side
    // is unknowable — pre-stat files, or a mask without a consistent
    // recorded count); == rows on mask-free files
    StructField("live_rows", LongType, nullable = true),
    // the :bytes pseudo-stat (on-disk size recorded at commit)
    StructField("bytes", LongType, nullable = true),
    StructField("masked", BooleanType, nullable = false),
    StructField("dv_sidecars", IntegerType, nullable = false),
    StructField("stats", StringType, nullable = true)))

  override def name(): String = tName
  override def schema(): StructType = filesSchema
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.Scan
        with org.apache.spark.sql.connector.read.LocalScan {
      override def readSchema(): StructType = filesSchema
      override def description(): String = tName
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = {
        val v = SnapshotLog.latestVersion(tableDirPath).getOrElse(
          sys.error(s"no committed version in $tableDirPath"))
        val (files, stats, _, _, dv) =
          SnapshotLog.manifestDetailsAt(tableDirPath, v)
        files.map { f =>
          val cols = Option(stats).flatMap(s => Option(s.get(f)))
          val rows = cols.flatMap(c => Option(c.get(":rows")))
            .flatMap(r => Option(r.get("n")))
            .filter(_.isIntegralNumber).map(_.asLong)
          val masked = cols.flatMap(c => Option(c.get(":masked")))
            .filter(n => dv.get(f).exists(_.size == n.path("s").asInt(-1)))
            .flatMap(n => Option(n.get("n")))
            .filter(_.isIntegralNumber).map(_.asLong)
          val live =
            if (!dv.contains(f)) rows
            else for (r <- rows; m <- masked) yield r - m
          val bytes = cols.flatMap(c => Option(c.get(":bytes")))
            .flatMap(b => Option(b.get("b")))
            .filter(_.isIntegralNumber).map(_.asLong)
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](
              org.apache.spark.unsafe.types.UTF8String.fromString(f),
              rows.map(java.lang.Long.valueOf).orNull,
              live.map(java.lang.Long.valueOf).orNull,
              bytes.map(java.lang.Long.valueOf).orNull,
              dv.contains(f),
              dv.get(f).fold(0)(_.size),
              cols.map(c => org.apache.spark.unsafe.types.UTF8String
                .fromString(c.toString)).orNull))
            : org.apache.spark.sql.catalyst.InternalRow
        }.toArray
      }
    }
}

/** `snap.ns.t.changes` — the CHANGE DATA FEED as a catalog-native
  * metadata table beside `.files`/`.history` (Iceberg's `.changes`
  * spelling on this log's feed). The schema is STATIC — the table's
  * recorded schema plus `_change_type`/`_commit_version` — which is
  * exactly why this surface can exist where the plain table's
  * `changeFeed` option cannot: `readStream.table` resolves the
  * TABLE's schema before scan options exist, so the feed's two extra
  * columns can never ride the main table, but they ARE this table's
  * schema.
  *
  * Both read surfaces serve the one feed implementation, bounds and
  * refusal taxonomy included (restore/replace/truncate ranges refuse
  * inside [[SnapshotLog.readChangeFeed]]; clock-skew and
  * pre-provenance refusals inside the ByTime form):
  *
  *  - BATCH: `spark.read.option("endVersion", 5).table(
  *    "snap.ns.t.changes")` — `startVersion`/`endVersion` are the
  *    first/last EMITTED versions (inclusive, the streaming source's
  *    convention; defaults: the whole history), or
  *    `startingTimestamp`/`endingTimestamp` resolve through
  *    [[SnapshotLog.readChangeFeedByTime]]. Served through a
  *    [[org.apache.spark.sql.connector.read.V1Scan]] whose relation
  *    IS the feed verb's DataFrame — zero plan duplication, every
  *    feed contract verbatim.
  *  - STREAMING: `spark.readStream.table("snap.ns.t.changes")` — the
  *    same micro-batch stream the format surface serves, with
  *    `changeFeed=true` implied by the table identity (plus the
  *    shared option vocabulary: startVersion, time bounds). */
private class SnapshotChangesTable(tName: String, tableDirPath: String)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.types._

  private val declared: StructType = {
    val v = SnapshotLog.latestVersion(tableDirPath).getOrElse(
      sys.error(s"no committed version in $tableDirPath"))
    val (files, schema) = SnapshotLog.manifestAt(tableDirPath, v)
    val base = schema.getOrElse(
      SparkSession.active.read.parquet(files: _*).schema)
    StructType(base.fields ++ Seq(
      StructField(ChangeFeed.ChangeTypeCol, StringType, nullable = false),
      StructField(ChangeFeed.CommitVersionCol, LongType, nullable = false)))
  }

  override def name(): String = tName
  override def schema(): StructType = declared
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ,
      org.apache.spark.sql.connector.catalog.TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.V1Scan {
      override def readSchema(): StructType = declared
      override def description(): String = tName

      override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
          with org.apache.spark.sql.sources.TableScan](
          context: org.apache.spark.sql.SQLContext): T =
        new org.apache.spark.sql.sources.BaseRelation
            with org.apache.spark.sql.sources.TableScan {
          override def sqlContext: org.apache.spark.sql.SQLContext = context
          override def schema: StructType = declared
          override def buildScan()
              : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
            val spark = context.sparkSession
            val hasTs = options.get("startingTimestamp") != null ||
              options.get("endingTimestamp") != null
            require(!hasTs || (options.get("startVersion") == null &&
              options.get("endVersion") == null),
              s"$tName: version bounds and timestamp bounds are " +
                "exclusive — pick one clock")
            val df =
              if (hasTs) {
                val lo = Option(options.get("startingTimestamp"))
                  .map(ChangeFeed.parseTs("startingTimestamp", _))
                  .getOrElse(java.time.Instant.EPOCH)
                val hi = Option(options.get("endingTimestamp"))
                  .map(ChangeFeed.parseTs("endingTimestamp", _))
                  .getOrElse(java.time.Instant.ofEpochMilli(Long.MaxValue))
                SnapshotLog.readChangeFeedByTime(spark, tableDirPath, lo, hi)
              } else {
                val latest = SnapshotLog.latestVersion(tableDirPath)
                  .getOrElse(sys.error(
                    s"no committed version in $tableDirPath"))
                // inclusive emitted-version bounds, the streaming
                // source's convention (startVersion 0 = whole history)
                val startV = options.getLong("startVersion", 0L)
                val endV = options.getLong("endVersion", latest)
                SnapshotLog.readChangeFeed(spark, tableDirPath,
                  startV - 1, endV)
              }
            // a range pinned entirely under an OLDER schema would make
            // the feed's columns diverge from this table's declared
            // (latest) schema — positional binding would then lie.
            // `declared` resolved at loadTable; a schema-changing
            // commit between load and this scan trips the same
            // require (acceptable TOCTOU: loud, never wrong).
            require(df.columns.toSeq == declared.fieldNames.toSeq,
              s"$tName: the asked range's schema " +
                s"(${df.columns.mkString(", ")}) differs from the " +
                s"table's schema as resolved at load " +
                s"(${declared.fieldNames.mkString(", ")}) — either " +
                "the range pins an older schema, or a concurrent " +
                "DDL commit changed the schema between load and " +
                "scan (re-resolve the table). Read the feed for " +
                "that range with SnapshotLog.readChangeFeed / the " +
                "snap_table_changes TVF instead")
            df.rdd
          }
        }.asInstanceOf[T]

      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
        val merged = new java.util.HashMap[String, String](
          options.asCaseSensitiveMap())
        merged.put("changeFeed", "true"): Unit
        SnapshotStreamBuild.microBatch(tableDirPath, declared,
          new CaseInsensitiveStringMap(merged))
      }
    }
}

/** SQL surface of a schema-recorded snapshot table — identity-named
  * or column-mapped ([[SnapshotLog.renameColumn]]): every scan plans
  * through [[org.apache.spark.sql.graftbridge.PruningParquetScanBuilder]],
  * so the predicates SQL pushes down FILE-PRUNE against the manifest
  * stats (and the bloom index, for equality/IN on an indexed column)
  * before Spark lists a single path — [[SnapshotLog.readWhere]] /
  * [[SnapshotLog.readWhereIn]]'s skipping, now free on `SELECT … WHERE`
  * through the catalog. Pruning is planning-time only and provably
  * conservative (the builder keeps every predicate as residual), so a
  * SQL result can never differ from the unpruned scan.
  *
  * Mapped tables expose the LOGICAL schema and translate at the two
  * name boundaries (rows are positional — the data path, vectorized
  * reader included, never notices): column pruning and the re-pushed
  * predicates rename logical→physical on the way into the parquet
  * stack, the scan's reported read schema renames back. The rename of
  * the predicates is what RESTORES scan-level filter pushdown on
  * mapped tables — the pre-pruning wrapper had to give it up, trading
  * it for zero-rewrite renames; now both hold. */
private class PrunedSnapshotTable(tName: String, tableDir: String,
    version: Long, files: Seq[String],
    stats: com.fasterxml.jackson.databind.JsonNode,
    recorded: StructType, colmap: Map[String, String],
    dv: Map[String, Seq[String]] = Map.empty,
    writable: Boolean = false)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.TruncatableTable
    with SnapshotSqlTable {

  /** `TRUNCATE TABLE snap.ns.t` → [[SnapshotLog.truncate]]: one
    * metadata-only zero-file commit (schema/colmap carried; time
    * travel keeps the pre-truncate versions; restore un-truncates).
    * Latest-version loads only — truncating through a time-travel pin
    * would silently retarget, the same rule as every DML verb. */
  override def truncateTable(): Boolean = {
    require(writable, s"$tName: TRUNCATE on a time-travel pinned " +
      "relation — DML targets the latest version only")
    SnapshotLog.truncate(tableDir)
    true
  }

  override def snapshotTableDir: String = tableDir
  override def snapshotWritable: Boolean = writable

  private val phys2log: Map[String, String] = colmap.map(_.swap)

  /** DESCRIBE TABLE EXTENDED surface: where this table sits in its
    * lifecycle, from metadata already in hand (no extra I/O). */
  override def properties(): util.Map[String, String] = (Map(
    "snapshot.version" -> version.toString,
    "snapshot.op" -> SnapshotLog.opAt(tableDir, version),
    "snapshot.files" -> files.size.toString,
    "snapshot.stats" -> (stats != null).toString,
    "snapshot.columnMapped" -> colmap.nonEmpty.toString,
    "snapshot.dvFiles" -> dv.size.toString) ++
    bucketLayout.map { case (pcs, n, _) =>
      "snapshot.bucket" -> s"bucket($n, ${pcs.map(pc =>
        phys2log.getOrElse(pc, pc)).mkString(", ")})"
    }).asJava
  private val physical: StructType =
    if (colmap.isEmpty) recorded
    else StructType(recorded.fields.map(f =>
      f.copy(name = colmap.getOrElse(f.name, f.name))))

  override def name(): String = tName
  override def schema(): StructType = recorded

  /** The table's CHECK constraints, surfaced to DESCRIBE and the
    * analyzer. Always ENFORCED + VALID — [[SnapshotLog.addConstraint]]
    * validated the live data before recording, and every row-creating
    * verb has checked them since; RELY is deliberately false (the
    * optimizer may not assume what a concurrent out-of-band writer
    * could have broken between loads). */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    SnapshotLog.constraints(tableDir).map { case (n, sql) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check(n).predicateSql(sql).enforced(true)
        .validationStatus(org.apache.spark.sql.connector.catalog
          .constraints.Constraint.ValidationStatus.VALID)
        .rely(false).build()
        : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] = {
    import org.apache.spark.sql.connector.catalog.TableCapability._
    // writes and STREAMING reads/writes only on a latest-version load:
    // a time-travel pin advertising write capabilities would let INSERT
    // retarget history, and a pinned version is a fixed relation — a
    // stream over it would emit its history once and hang, which the
    // batch read already does better
    // AUTOMATIC_SCHEMA_EVOLUTION: opts into Spark's OWN analyzer-driven
    // `MERGE … WITH SCHEMA EVOLUTION` (ResolveMergeIntoSchemaEvolution
    // computes the AddColumn TableChanges from the source schema and
    // routes them through this catalog's alterTable — i.e. the log's
    // metadata-only addColumn, no-resurrection physicals included —
    // then re-resolves the merge against the evolved table). Additive
    // nullable top-level columns only: any other change Spark derives
    // (type widening, nested) hits alterTable's loud refusals, so the
    // statement fails before anything publishes
    if (writable) java.util.EnumSet.of(BATCH_READ, MICRO_BATCH_READ,
      V1_BATCH_WRITE, STREAMING_WRITE, TRUNCATE,
      AUTOMATIC_SCHEMA_EVOLUTION)
    else java.util.EnumSet.of(BATCH_READ)
  }

  private def fileCols(f: String)
      : Option[com.fasterxml.jackson.databind.JsonNode] =
    Option(stats).flatMap(s => Option(s.get(f)))

  /** The manifest-recorded footer row count of `f` — the `:rows`
    * pseudo-stat harvested at commit (None for files committed before
    * it existed, or whose harvest failed). */
  private def rowsOf(f: String): Option[Long] =
    fileCols(f).flatMap(c => Option(c.get(":rows")))
      .flatMap(r => Option(r.get("n")))
      .filter(_.isIntegralNumber).map(_.asLong)

  /** The manifest-recorded EXACT deleted-row count of `f` under its
    * CURRENT deletion mask — the `:masked` pseudo-stat the dv-writing
    * verbs maintain (deduped across sidecar re-marks at commit time).
    * Version-consistency gate: the stat's recorded sidecar-list length
    * ("s") must equal the live list's — a stat describing an older,
    * shorter list declines rather than under-counts. None for files
    * without a mask or with an inconsistent/absent stat. */
  private def maskedOf(f: String): Option[Long] =
    fileCols(f).flatMap(c => Option(c.get(":masked")))
      .filter(n => dv.get(f).exists(_.size == n.path("s").asInt(-1)))
      .flatMap(n => Option(n.get("n")))
      .filter(_.isIntegralNumber).map(_.asLong)

  /** `f`'s exact LIVE row count: footer rows minus the exact masked
    * count (0 for mask-free files). None when either side is
    * unknowable — consumers decline. */
  private def liveRowsOf(f: String): Option[Long] =
    rowsOf(f).flatMap { r =>
      if (!dv.contains(f)) Some(r)
      else maskedOf(f).map(m => r - m)
    }

  /** The manifest-recorded on-disk size of `f` — the `:bytes`
    * pseudo-stat harvested at commit (None for files committed before
    * it existed — scan statistics then fall back to a filesystem
    * stat). A real column literally named ":bytes" never minted the
    * pseudo-stat, so its harvested min/max node lacks the "b" field
    * and this reads None — degrade, never mis-read. */
  private def bytesOf(f: String): Option[Long] =
    fileCols(f).flatMap(c => Option(c.get(":bytes")))
      .flatMap(b => Option(b.get("b")))
      .filter(_.isIntegralNumber).map(_.asLong)

  /** LIMIT as FILE-LIST pruning: the manifest prefix whose recorded
    * LIVE row counts cover `n` rows — `SELECT * FROM t LIMIT 10` then
    * plans one file's tasks instead of the whole table's. Exact-only,
    * like every metadata answer: any file missing `:rows` declines,
    * and a dv-bearing file counts `:rows − :masked` (the exact deduped
    * mask cardinality the dv-writing verbs record) or declines when
    * the stat is absent/inconsistent — masked files would otherwise
    * make the prefix under-deliver. Partial pushdown contract (Spark
    * keeps its Limit): the prefix must hold AT LEAST min(n, table)
    * rows, which exact live counts guarantee. */
  private def limitFiles(n: Int): Option[Seq[String]] = {
    if (n <= 0 || recorded.fieldNames.contains(":rows") ||
        recorded.fieldNames.contains(":masked"))
      return None
    val out = Seq.newBuilder[String]
    var acc = 0L
    var i = 0
    while (i < files.length && acc < n) {
      liveRowsOf(files(i)) match {
        case None => return None
        case Some(r) => acc += r; out += files(i)
      }
      i += 1
    }
    val kept = out.result()
    ScanPrune.recordLimit(tName, kept.size, files.size)
    Some(kept)
  }

  /** METADATA-ONLY AGGREGATES — answer an ungrouped
    * COUNT(*)/COUNT(col)/MIN(col)/MAX(col) Aggregation exactly from
    * the manifest's per-file stats, or decline (None → ordinary scan +
    * aggregate). The Iceberg/Delta shortcut: at 100 TB a bare
    * `SELECT count(*)` is O(files) driver JSON lookups instead of a
    * full table scan. Every rule below exists because a wrong answer
    * here IS the query result (no residual re-check protects an
    * aggregate the way it protects file pruning), so only provably
    * exact facts answer:
    *
    *  - COUNT(*) on a version carrying DELETION MASKS answers
    *    Σ`:rows` − Σ`:masked` — the dv-writing verbs record each
    *    file's EXACT deduped mask cardinality at commit time
    *    (sidecar re-marks of the same position are deduped there,
    *    which is why raw sidecar row counts never subtract), gated on
    *    version consistency (the stat's recorded sidecar-list length
    *    must match the live list's). Any dv file missing a consistent
    *    `:masked` declines. COUNT(col)/MIN/MAX still decline on dv
    *    versions: a mask can hide any share of a column's nulls or
    *    its extremes, and per-column subtraction has no recorded fact
    *    to stand on (compaction retires the masks and restores them);
    *  - COUNT(*) needs every file's `:rows` pseudo-stat (harvested
    *    from footer block counts since this round; older manifests
    *    decline);
    *  - COUNT(col) additionally needs the column's exact `nulls`
    *    count in every file (a file the harvest poisoned — unset
    *    num_nulls in any row group — declines); `allNull` files
    *    contribute zero. COUNT(DISTINCT …) is never answerable;
    *  - MIN/MAX(col) only for LONG-KIND recorded stats on integral /
    *    date / micros-timestamp columns: parquet's fixed-width stats
    *    are exact values. DOUBLE/FLOAT decline (footers ignore NaN,
    *    Spark's MAX sorts NaN above everything — the stat can't see
    *    the true answer); STRING declines (writers may truncate
    *    binary bounds — a bound is not the value); every file must
    *    carry the column's stats or be provably allNull;
    *  - a schema containing a real column named ":rows" shadows the
    *    pseudo-stat — decline everything rather than read ambiguity.
    *
    * Output schema/values positionally match the agg expressions
    * (internal representations: Long/Int/…; null MIN/MAX on an
    * empty/all-null table — a zero-file genesis answers (0, null)). */
  private def aggAnswer(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{
      Count, CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.types._
    if (agg.groupByExpressions.nonEmpty ||
      recorded.fieldNames.contains(":rows") ||
      recorded.fieldNames.contains(":masked")) return None
    lazy val totalRows: Option[Long] = {
      val per = files.map(liveRowsOf)
      if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
    }
    // SQL resolves case-insensitively by default; the pushed reference
    // carries the resolved attribute's case, but match the recorded
    // schema defensively (exact first, unique fold otherwise)
    def fieldOf(name: String): Option[StructField] =
      recorded.fields.find(_.name == name).orElse {
        recorded.fields.filter(_.name.equalsIgnoreCase(name)) match {
          case Array(one) => Some(one)
          case _ => None
        }
      }
    def colRef(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[StructField] = e match {
      case nr: NamedReference if nr.fieldNames().length == 1 =>
        fieldOf(nr.fieldNames().head)
      case _ => None
    }
    def countCol(field: StructField): Option[Long] = {
      // a mask can hide any share of the column's nulls — no recorded
      // per-column fact subtracts soundly on a dv version
      if (dv.nonEmpty) return None
      val phys = colmap.getOrElse(field.name, field.name)
      val per = files.map { f =>
        for {
          node <- fileCols(f).flatMap(c => Option(c.get(phys)))
          nonNull <-
            if (node.path("allNull").asBoolean(false)) Some(0L)
            else for {
              rows <- rowsOf(f)
              nulls <- Option(node.get("nulls"))
                .filter(_.isIntegralNumber).map(_.asLong)
            } yield rows - nulls
        } yield nonNull
      }
      if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
    }
    def minMax(field: StructField, wantMin: Boolean): Option[Any] = {
      // a mask can hide exactly the extreme the footer recorded
      if (dv.nonEmpty) return None
      val longKind = field.dataType match {
        case LongType | IntegerType | ShortType | ByteType | DateType |
             TimestampType | TimestampNTZType => true
        case _ => false
      }
      if (!longKind) return None
      val phys = colmap.getOrElse(field.name, field.name)
      var best: Option[Long] = None
      files.foreach { f =>
        fileCols(f).flatMap(c => Option(c.get(phys))) match {
          case None => return None
          case Some(node) if node.path("allNull").asBoolean(false) => ()
          case Some(node) =>
            val b = Option(node.get(if (wantMin) "min" else "max"))
              .filter(_.isIntegralNumber).map(_.asLong)
              .getOrElse(return None)
            best = Some(best.fold(b)(p =>
              if (wantMin) math.min(p, b) else math.max(p, b)))
        }
      }
      // recorded long → the column type's catalyst-internal value; a
      // value outside the narrow type's range means the stat and the
      // schema disagree — decline, never mis-answer
      best match {
        case None => Some(null)
        case Some(l) => field.dataType match {
          case LongType | TimestampType | TimestampNTZType => Some(l)
          case IntegerType | DateType =>
            if (l < Int.MinValue || l > Int.MaxValue) None else Some(l.toInt)
          case ShortType =>
            if (l < Short.MinValue || l > Short.MaxValue) None
            else Some(l.toShort)
          case ByteType =>
            if (l < Byte.MinValue || l > Byte.MaxValue) None
            else Some(l.toByte)
          case _ => None
        }
      }
    }
    val answered = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => totalRows.map(n =>
        (StructField("count(*)", LongType, nullable = false), n: Any))
      case c: Count if !c.isDistinct =>
        colRef(c.column()).flatMap(f => countCol(f).map(n =>
          (StructField(s"count(${f.name})", LongType, nullable = false),
            n: Any)))
      case m: Min => colRef(m.column()).flatMap { f =>
        minMax(f, wantMin = true).map(v =>
          (StructField(s"min(${f.name})", f.dataType), v))
      }
      case m: Max => colRef(m.column()).flatMap { f =>
        minMax(f, wantMin = false).map(v =>
          (StructField(s"max(${f.name})", f.dataType), v))
      }
      case _ => None
    }
    if (answered.exists(_.isEmpty) || answered.isEmpty) None
    else Some((StructType(answered.flatten.map(_._1)),
      answered.flatten.map(_._2).toArray))
  }

  /** The version's consistent bucket layout, if any
    * ([[SnapshotLog.bucketLayoutOf]] — every file carries an agreeing
    * `:bucket` pseudo-stat), vetted for the scan: the physical column
    * must still be live in the schema (a DROPPED bucket column leaves
    * orphaned pseudo-stats — degrade). Dv-bearing versions report too
    * (round 18): a deletion mask only DROPS rows — a row's bucket id
    * is a function of its key — so the co-partitioning claim stays
    * exact and the bucket scan masks its dv'd files executor-side,
    * exactly like the ordinary scan; SPJ then serves BETWEEN
    * compactions, the regime a lakehouse actually lives in. */
  private lazy val bucketLayout: Option[(Seq[String], Int, Map[String, Int])] =
    SnapshotLog.bucketLayoutOf(stats, files).filter { case (pcs, _, _) =>
      pcs.forall(physical.fieldNames.contains)
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder = {
    val spark = SparkSession.active
    new org.apache.spark.sql.graftbridge.PruningParquetScanBuilder(
      spark, tName, physical,
      filters => ScanPrune.kept(spark, tableDir, tName, files, stats,
        Some(recorded), colmap, filters),
      mapName = c => colmap.getOrElse(c, c),
      unmapName = c => phys2log.getOrElse(c, c),
      dv = dv,
      aggAnswer = aggAnswer,
      limitFiles = limitFiles,
      bucket = bucketLayout,
      bytesOf = bytesOf,
      rowsOfFile = liveRowsOf,
      // `spark.readStream.table("snap.ns.t")` — the catalog face of
      // the snapshot stream source (SnapshotStreamBuild owns the
      // option vocabulary: startVersion, ignoreChanges, time bounds;
      // changeFeed refuses here naming the format surface, whose
      // inferSchema can carry the feed's two extra columns)
      streamFor =
        if (writable) Some(() =>
          SnapshotStreamBuild.microBatch(tableDir, recorded, options))
        else None)
  }

  /** `INSERT INTO` / `INSERT OVERWRITE` as the log's own commits — a
    * V1 write bridge (the DataFrame hand-off [[SnapshotLog.commitAppend]]
    * / [[SnapshotLog.commit]] already speak; the data write inside the
    * verbs is Spark's distributed parquet writer either way, so
    * nothing is serialized through the driver):
    *
    *  - append → `commitAppend`: O(batch) files + carried stats, exact
    *    schema enforcement (the batch must read back with the recorded
    *    schema), dv entries carried, logical→physical renames under a
    *    column map — everything the Scala append does, verbatim;
    *  - INSERT OVERWRITE → `commit`: the full-replacement semantics
    *    the SQL verb asks for (a fresh generation; history keeps the
    *    old versions for time travel).
    *
    * Both publish with the verbs' put-if-absent OCC — a concurrent
    * writer conflicts exactly as it would against the Scala API. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(writable, s"$tName: INSERT into a time-travel pinned " +
      "relation — DML targets the latest version only")
    // the explicit upsert signal for the streaming sink: Spark's V2
    // update-mode dispatch is a METHODLESS marker (update compiles to
    // a plain build()), so the writer option — not the mode — selects
    // upsert semantics, and the marker is advertised ONLY when the
    // option names the key (update mode without it would silently
    // append duplicate keys — Spark's own "does not support Update"
    // refusal is the honest answer there)
    val upsertKey = Option(info.options().get("upsertKey"))
      .map(_.trim).filter(_.nonEmpty)
    upsertKey.foreach { k =>
      require(recorded.fieldNames.contains(k),
        s"$tName: upsertKey `$k` is not a table column " +
          s"(${recorded.fieldNames.mkString(", ")})")
    }
    // last-wins epoch compaction for the plain keyed upsert sink: a
    // catch-up micro-batch can carry a key twice; this column orders
    // the duplicates (max wins). The key itself can't disambiguate
    // its own duplicates, so ordering by it is refused.
    val upsertOrderBy = Option(info.options().get("upsertOrderBy"))
      .map(_.trim).filter(_.nonEmpty)
    upsertOrderBy.foreach { ob =>
      require(upsertKey.isDefined,
        s"$tName: upsertOrderBy only orders an upsert — set " +
          "upsertKey too")
      require(recorded.fieldNames.contains(ob),
        s"$tName: upsertOrderBy `$ob` is not a table column " +
          s"(${recorded.fieldNames.mkString(", ")})")
      require(!upsertKey.contains(ob),
        s"$tName: upsertOrderBy `$ob` is the upsert key — a key " +
          "cannot order its own duplicates; pick an ordering column " +
          "(event time, sequence number)")
    }
    class SnapWriteBuilder
        extends org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var replace = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        replace = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation = {
            // a BATCH write ignoring the option would silently append
            // duplicate keys — refuse naming the right surfaces
            require(upsertKey.isEmpty,
              s"$tName: upsertKey is a streaming-sink option " +
                "(writeStream.toTable) — batch upserts are MERGE INTO's " +
                "job, or SnapshotLog.mergeIntoMOR")
            (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
              val spark = data.sparkSession
              if (replace) SnapshotLog.commit(spark, tableDir, data): Unit
              else SnapshotLog.commitAppend(spark, tableDir, data): Unit
            }
          }

          /** `writeStream.toTable("snap.ns.t")` — the table-addressed
            * face of the exactly-once streaming sink
            * ([[SnapshotStreamingWrite]]: executor-side parquet
            * writers, one idempotent manifest publish per epoch at
            * `sinkBase + epochId`), in all three output modes:
            * append → the table grows by each epoch's files; complete
            * (Spark spells it `truncate()` on this builder) → each
            * epoch's files REPLACE the table, INSERT OVERWRITE per
            * trigger with history kept; update → requires
            * `.option("upsertKey", <col>)` and applies each epoch as
            * a keyed MOR upsert (mask + append, O(epoch) work). The
            * stream's schema must BE the table's recorded schema
            * (names + types, positionally; nullability may tighten):
            * this surface pins schema at stream start and never
            * evolves it — the format surface's `mergeSchema` opt-in
            * is the evolution path. */
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
            require(!(replace && upsertKey.isDefined),
              s"$tName: complete mode and upsertKey conflict — a " +
                "complete epoch replaces the whole table, so there is " +
                "nothing to upsert into; drop one of the two")
            require(!info.options().getBoolean("mergeSchema", false),
              s"$tName: mergeSchema is not available on the " +
                "table-addressed streaming sink (the catalog resolved " +
                "this table's schema before the stream started) — use " +
                "writeStream.format(\"graft-snaplog\")" +
                ".option(\"tableDir\", …).option(\"mergeSchema\", true)")
            val in = info.schema()
            def prefixMatches(n: Int): Boolean =
              in.fields.take(n).zip(recorded.fields).forall { case (a, b) =>
                a.name == b.name && a.dataType == b.dataType }
            // upsertKey also accepts the CHANGE-FEED shape — the
            // table's schema plus the feed's two columns, exactly what
            // `readStream.table("….changes")` emits — turning one line
            // of catalog surface into table replication (deletes
            // honored, multi-version epochs last-wins-compacted)
            val isCdc = upsertKey.isDefined &&
              in.length == recorded.length + 2 &&
              prefixMatches(recorded.length) && {
                val Array(ct, cv) = in.fields.takeRight(2)
                ct.name == ChangeFeed.ChangeTypeCol &&
                  ct.dataType == org.apache.spark.sql.types.StringType &&
                  cv.name == ChangeFeed.CommitVersionCol &&
                  cv.dataType == org.apache.spark.sql.types.LongType
              }
            require(isCdc ||
              (in.length == recorded.length && prefixMatches(in.length)),
              s"$tName: streaming write schema $in does not match the " +
                s"recorded table schema $recorded (names and types, " +
                "in order)" + (if (upsertKey.isDefined)
                  s" or the change-feed shape (table schema + " +
                    s"${ChangeFeed.ChangeTypeCol} STRING, " +
                    s"${ChangeFeed.CommitVersionCol} BIGINT)" else "") +
                " — the table-addressed sink never evolves " +
                "schema; SELECT the table's columns explicitly")
            // files carry PHYSICAL names under a column map; the
            // positional rename here is appendAt's `toDF(batchPhys)`
            // (the feed columns have no colmap entry and pass through)
            val phys = StructType(in.fields.map(f =>
              f.copy(name = colmap.getOrElse(f.name, f.name))))
            val mode =
              if (replace) SnapshotSinkMode.Replace
              else if (isCdc) {
                require(upsertOrderBy.isEmpty,
                  s"$tName: upsertOrderBy conflicts with a " +
                    "change-feed-shaped stream — the feed's " +
                    s"${ChangeFeed.CommitVersionCol} already orders " +
                    "the epoch's duplicates (last-wins); drop the " +
                    "option")
                SnapshotSinkMode.CdcApply(upsertKey.get, in)
              }
              // `in` carries LOGICAL names (it arrived from the
              // analyzed plan and matched `recorded` above) — exactly
              // what the upsert feed's read-back rename needs
              else upsertKey.map(k =>
                SnapshotSinkMode.Upsert(k, in, upsertOrderBy))
                .getOrElse(SnapshotSinkMode.Ingest)
            new SnapshotStreamingWrite(SparkSession.active, tableDir,
              tName, info.queryId(), phys, mode)
          }
        }
    }
    if (upsertKey.isDefined)
      new SnapWriteBuilder
        with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend
    else new SnapWriteBuilder
  }
}

/** Pre-schema snapshot tables read through Spark's plain
  * [[ParquetTable]], which itself advertises write capabilities that
  * would drop files into the data directory BEHIND the manifest — a
  * write no reader would ever see. This wrapper forwards reads and
  * strips everything else. */
private class ReadOnlySnapshotTable(inner: Table
    with org.apache.spark.sql.connector.catalog.SupportsRead)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    inner.newScanBuilder(options)
}

/** Catalyst-predicate → file-prune translation for the catalog's
  * scan-time skipping. Handles exactly the shapes the manifest can
  * answer — equality / IN (stats equality + bloom membership),
  * range comparisons (stats intervals), IS [NOT] NULL (recorded null
  * counts / allNull), AND-composition, and OR as the union of branch
  * keeps — and keeps every file for anything else (functions,
  * UDF-wrapped columns, non-literal comparands): the prune may only
  * drop files a recorded fact proves dead. Literal comparands arrive ALREADY CAST to the column's type
  * (binary comparison requires it at analysis), so the bloom replay
  * hashes the exact width the index build hashed. Temporal internals
  * (epoch days / micros) round-trip through their java.time external
  * forms so dates and micros-timestamps prune like any clustered
  * column; decimals and nanos-encoded longs' TEMPORAL asks are
  * skipped (kept) — the Scala API's typed path behaves the same. */
private[graft] object ScanPrune {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._

  /** Last prune decision (table@version, kept, total) — observability
    * for specs and operators; scan planning is driver-side, so a
    * volatile slot is race-free per query in practice and only ever
    * advisory. */
  @volatile var last: Option[(String, Int, Int)] = None

  /** Prune decisions keyed by the scan's table name (`cat.ns.t@vN`) —
    * the concurrency-safe twin of [[last]]: a gate that runs while
    * OTHER snapshot scans plan in the same session (e.g. two Verify
    * invocations sharing a SparkSession) reads its own table's entry
    * instead of a slot any scan can overwrite. Same advisory-only
    * contract; gate entries use session-unique catalog names, so
    * entries cannot collide across runs. BOUNDED: a long-lived session
    * planning many (table, version) scans — streaming, repeated time
    * travel, per-invocation unique catalog names — must not accumulate
    * entries forever, so a put at capacity evicts only the OLDEST
    * entries (insertion order) — never the whole map. Clearing
    * everything was the first cut, but it could drop an entry a
    * CONCURRENTLY-planning scan had just written and was about to
    * read, surfacing as rare flakiness in suites sharing a long-lived
    * session; oldest-first eviction preserves recently-written
    * entries. */
  val decisions = scala.collection.concurrent.TrieMap.empty[String, (Int, Int)]
  private val decisionOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val DecisionsCap = 512

  /** LIMIT-as-file-pruning decisions, under the `@vN#limit`-suffixed
    * key (same advisory observability contract as [[decisions]]). */
  private[sources] def recordLimit(tName: String, kept: Int,
      total: Int): Unit = recordDecision(s"$tName#limit", (kept, total))

  private def recordDecision(tName: String, v: (Int, Int)): Unit = {
    if (decisions.put(tName, v).isEmpty) decisionOrder.add(tName): Unit
    // evict oldest beyond cap; skip the key just written (a re-put of
    // an old key re-enqueues it at the tail, keeping it fresh)
    while (decisions.size > DecisionsCap) {
      val oldest = decisionOrder.poll()
      if (oldest == null) return // queue drained by a racing evictor
      if (oldest == tName) decisionOrder.add(oldest): Unit
      else decisions.remove(oldest): Unit
    }
  }

  def kept(spark: SparkSession, tableDir: String, tName: String,
      files: Seq[String], stats: com.fasterxml.jackson.databind.JsonNode,
      schemaOpt: Option[StructType], colmap: Map[String, String],
      filters: Seq[Expression]): Seq[String] = {
    def membership(cur: Seq[String], name: String, values: Seq[Option[Any]])
        : Seq[String] =
      if (values.isEmpty || values.exists(_.isEmpty)) cur
      else SnapshotLog.pruneMembership(spark, tableDir, cur, stats,
        schemaOpt, colmap, name, values.map(_.get))
    def one(cur: Seq[String], e: Expression): Seq[String] = e match {
      // a FALSE (or NULL — filter semantics drop non-true) conjunct
      // proves no row can survive: zero files are needed. The shape
      // reaches the prune from the runtime-filter path — an EMPTY dim
      // side's IN arrives values-less and translates to false (see
      // PrunedSnapshotScan.toCatalyst); planning-time Catalyst folds
      // `WHERE false` to an empty relation before pushdown, so this
      // case is effectively runtime-only
      case Literal(v, BooleanType) if v == null || v == false => Nil
      case And(l, r) => one(one(cur, l), r)
      // OR prunes as the UNION of branch keeps: a file dropped by BOTH
      // branches provably satisfies neither disjunct. Conservative for
      // free — an unsupported branch keeps everything (its keep = cur),
      // so the union degrades to keep-all exactly when it must. Catalyst
      // usually normalizes same-attribute equality ORs to IN, but an
      // un-normalized `k = a OR k = b` (or a cross-attribute OR) now
      // prunes instead of falling through
      case Or(l, r) =>
        val keepL = one(cur, l).toSet
        val keepR = one(cur, r).toSet
        cur.filter(f => keepL.contains(f) || keepR.contains(f))
      case EqualTo(a: AttributeReference, l: Literal) =>
        membership(cur, a.name, Seq(scalaValue(l.value, l.dataType)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        membership(cur, a.name, Seq(scalaValue(l.value, l.dataType)))
      case EqualNullSafe(a: AttributeReference, l: Literal) =>
        if (l.value == null) SnapshotLog.pruneIsNull(cur, stats, colmap, a.name)
        else membership(cur, a.name, Seq(scalaValue(l.value, l.dataType)))
      case EqualNullSafe(l: Literal, a: AttributeReference) =>
        if (l.value == null) SnapshotLog.pruneIsNull(cur, stats, colmap, a.name)
        else membership(cur, a.name, Seq(scalaValue(l.value, l.dataType)))
      case In(a: AttributeReference, elems)
          if elems.forall(_.isInstanceOf[Literal]) =>
        membership(cur, a.name, elems.map { case l: Literal =>
          if (l.value == null) None else scalaValue(l.value, l.dataType) })
      case InSet(a: AttributeReference, hset) =>
        membership(cur, a.name, hset.toSeq.map(v =>
          if (v == null) None else scalaValue(v, a.dataType)))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        range(cur, a.name, lo = scalaValue(l.value, l.dataType), hi = None)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        range(cur, a.name, lo = scalaValue(l.value, l.dataType), hi = None)
      case LessThan(a: AttributeReference, l: Literal) =>
        range(cur, a.name, lo = None, hi = scalaValue(l.value, l.dataType))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        range(cur, a.name, lo = None, hi = scalaValue(l.value, l.dataType))
      // flipped comparisons: lit OP attr mirrors to attr OP' lit
      case GreaterThan(l: Literal, a: AttributeReference) =>
        range(cur, a.name, lo = None, hi = scalaValue(l.value, l.dataType))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        range(cur, a.name, lo = None, hi = scalaValue(l.value, l.dataType))
      case LessThan(l: Literal, a: AttributeReference) =>
        range(cur, a.name, lo = scalaValue(l.value, l.dataType), hi = None)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        range(cur, a.name, lo = scalaValue(l.value, l.dataType), hi = None)
      case IsNull(a: AttributeReference) =>
        SnapshotLog.pruneIsNull(cur, stats, colmap, a.name)
      case IsNotNull(a: AttributeReference) =>
        SnapshotLog.pruneNotNull(cur, stats, colmap, a.name)
      case _ => cur
    }
    def range(cur: Seq[String], name: String,
        lo: Option[Any], hi: Option[Any]): Seq[String] =
      if (lo.isEmpty && hi.isEmpty) cur
      else SnapshotLog.pruneRange(cur, stats, colmap, name, lo, hi)
    val out = filters.foldLeft(files)(one)
    last = Some((tName, out.size, files.size))
    recordDecision(tName, (out.size, files.size))
    out
  }

  /** Internal literal → the external value the prune helpers expect.
    * None = this type does not participate in SQL-side pruning (the
    * file is kept). Byte/Short widen to Int: the stats comparator
    * speaks Int/Long, and the bloom replay casts back to the column's
    * exact type before hashing. */
  private def scalaValue(v: Any, dt: DataType): Option[Any] = if (v == null) {
    // a null literal reaching the prune un-folded (NullPropagation
    // normally folds `a = NULL` away) must degrade to keep-all, not
    // feed Some(null) into pruneCore's non-null contract
    None
  } else dt match {
    case StringType => v match {
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
      case s: String => Some(s)
      case _ => None
    }
    case LongType | IntegerType | DoubleType | FloatType => Some(v)
    case ShortType => Some(v.asInstanceOf[Short].toInt)
    case ByteType => Some(v.asInstanceOf[Byte].toInt)
    // temporal internals → the external java.time forms the prune
    // helpers normalize back to the same numbers (days / micros):
    // round-tripping through the external type keeps ONE comparison
    // convention and lets the bloom replay build a typed literal
    case DateType => Some(java.time.LocalDate.ofEpochDay(
      v.asInstanceOf[Int].toLong))
    case TimestampType => Some(microsToInstant(v.asInstanceOf[Long]))
    case TimestampNTZType => Some(java.time.LocalDateTime.ofInstant(
      microsToInstant(v.asInstanceOf[Long]), java.time.ZoneOffset.UTC))
    case _ => None
  }

  private def microsToInstant(us: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)
}
