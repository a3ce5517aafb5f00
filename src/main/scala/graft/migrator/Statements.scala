package graft.migrator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ClickHouse-dialect statement translation → Spark actions.
  *
  * Regex-level translation, deliberately not a parser (SURVEY §7.3): the
  * reference forwards SQL text verbatim to ClickHouse
  * (reference: clickhouse_migrate/migrate.py:52). Shapes covered are the
  * fixture surface (reference: tests/clickhouse_migrations/,
  * tests/migrations_seq/V1_sequential_dmls.json) plus the statements a
  * real migration dir would contain: DROP/TRUNCATE/RENAME and the
  * ALTER…DELETE mutation. Anything else falls through to `spark.sql`
  * untouched (ANSI text).
  *
  * Scale notes: ALTER…ADD COLUMN / UPDATE / DELETE are whole-table
  * rewrites in a parquet world and are documented as such (SURVEY §2.9)
  * — physically the same work ClickHouse's mutations do. ClickHouse runs
  * them *asynchronously*; Spark writes are synchronous, so the
  * reference's mutation-completion barrier (`pipelined`,
  * migrate.py:56-71) is deleted by design — executing statements in
  * order IS the barrier (SURVEY §2.10).
  */
object Statements {

  /** ClickHouse → Spark SQL type mapping (signed-type policy, SURVEY §1.2).
    * Wrapper types unwrap: Nullable(T) (all Spark columns are nullable),
    * LowCardinality(T) (an encoding hint, not a type). */
  def mapType(chType: String): String = {
    val t = chType.trim
    val wrapper = """(?i)^(Nullable|LowCardinality)\s*\((.*)\)$""".r
    val decimal = """(?i)^Decimal\s*\((\d+)\s*,\s*(\d+)\)$""".r
    val dt64 = """(?i)^DateTime64\s*\(.*\)$""".r
    val fixedStr = """(?i)^FixedString\s*\(\d+\)$""".r
    t match {
      case wrapper(_, inner) => mapType(inner)
      case decimal(p, s) => s"DECIMAL($p,$s)"
      case dt64() => "TIMESTAMP"
      case fixedStr() => "STRING"
      case _ => t.toLowerCase match {
        case "uint8" | "int8" | "uint16" | "int16" => "SMALLINT"
        case "uint32" | "int32" => "INT"
        case "uint64" | "int64" => "BIGINT"
        case "float32" => "FLOAT"
        case "float64" => "DOUBLE"
        case "string" => "STRING"
        case "datetime" => "TIMESTAMP"
        case "date" | "date32" => "DATE"
        case "bool" | "boolean" => "BOOLEAN"
        case _ => t // already ANSI
      }
    }
  }

  private val CreateDbRe =
    """(?is)^\s*CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*$""".r
  private val CreateTableRe =
    """(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.*)$""".r
  private val AddColumnRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+([\w()\s,]+?)(?:\s+DEFAULT\s+(.+?))?\s*$""".r
  private val DropColumnRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val UpdateRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+UPDATE\s+(.+?)\s+WHERE\s+(.+?)\s*$""".r
  private val DeleteRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+DELETE\s+WHERE\s+(.+?)\s*$""".r
  private val DropTableRe =
    """(?is)^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$""".r
  private val TruncateRe =
    """(?is)^\s*TRUNCATE\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$""".r
  private val RenameRe =
    """(?is)^\s*RENAME\s+TABLE\s+([\w.]+)\s+TO\s+([\w.]+)\s*$""".r
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+TABLE\s+([\w.]+)(?:\s+FINAL)?\s*$""".r
  private val DetachRe =
    """(?is)^\s*DETACH\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$""".r
  private val AttachRe =
    """(?is)^\s*ATTACH\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*$""".r
  private val AttachDefRe =
    """(?is)^\s*ATTACH\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.*)$""".r
  // ClickHouse bulk-ingest statement: the reference pipes a gzip CSV
  // into `clickhouse-client --query="INSERT INTO db.t FORMAT
  // CSVWithNames"` (reference: tests/test_clickhouse_migration.py:101).
  // The self-contained migration-file form of the same ingest is
  // `INSERT INTO t [(cols)] FROM INFILE 'path' FORMAT CSVWithNames` —
  // ClickHouse's own file-ingest clause; compression is inferred from
  // the extension on both engines (Spark reads .gz transparently).
  private val InsertInfileRe =
    ("""(?is)^\s*INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\)\s*)?""" +
      """FROM\s+INFILE\s+'([^']+)'\s*(?:COMPRESSION\s+'\w+'\s*)?""" +
      """FORMAT\s+(CSVWithNames|CSV|TabSeparatedWithNames|TSVWithNames|TabSeparated|TSV)\s*$""").r
  // Inline-data form: `INSERT INTO t [(cols)] FORMAT Values (…),(…)` —
  // ClickHouse spells the ANSI VALUES list through its FORMAT clause.
  private val InsertValuesRe =
    """(?is)^\s*INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\)\s*)?FORMAT\s+Values\s+(.+)$""".r

  /** Hidden-name suffix a DETACHed table parks under. */
  private[migrator] val DetachedSuffix = "__graft_detached"

  /** Execute one (possibly ClickHouse-dialect) statement against Spark. */
  def execute(spark: SparkSession, statement: String): Unit = statement match {
    case CreateDbRe(_, db) =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

    case CreateTableRe(ifNotExists, table, rest) =>
      val ine = if (ifNotExists != null) "IF NOT EXISTS " else ""
      // ENGINE/PARTITION BY tuple()/ORDER BY tuple() have no Spark
      // meaning (ORDER BY tuple() = unordered = default) — stripped.
      spark.sql(s"CREATE TABLE $ine$table (${parseColumnDefs(rest).mkString(", ")}) USING parquet")

    case AddColumnRe(table, colName, chType, default) =>
      val sparkType = mapType(chType)
      val defaultExpr =
        if (default == null) lit(null).cast(sparkType)
        else expr(default).cast(sparkType)
      rewriteTable(spark, table)(_.withColumn(colName, defaultExpr))

    case DropColumnRe(table, colName) =>
      rewriteTable(spark, table)(_.drop(colName))

    case UpdateRe(table, assignments, predicate) =>
      // ALTER…UPDATE: masked overwrite via when(pred, v).otherwise(col).
      val pred = expr(predicate)
      rewriteTable(spark, table) { df =>
        splitTopLevel(assignments).foldLeft(df) { (acc, assignment) =>
          val Array(colName, value) = assignment.split("=", 2).map(_.trim)
          acc.withColumn(colName,
            when(pred, expr(value).cast(acc.schema(colName).dataType))
              .otherwise(col(colName)))
        }
      }

    case DeleteRe(table, predicate) =>
      // ALTER…DELETE mutation → keep the complement
      rewriteTable(spark, table)(_.filter(!expr(predicate)))

    case DropTableRe(ifExists, table) =>
      val ie = if (ifExists != null) "IF EXISTS " else ""
      spark.sql(s"DROP TABLE $ie$table")

    case TruncateRe(_, table) =>
      rewriteTable(spark, table)(_.limit(0))

    case RenameRe(from, to) =>
      spark.sql(s"ALTER TABLE $from RENAME TO $to")

    case OptimizeRe(table) =>
      // ClickHouse OPTIMIZE forces a part merge; the parquet analog is a
      // full read-back-and-rewrite, which compacts small files (the scan
      // packs small files into maxPartitionBytes-sized splits, so the
      // rewrite emits one file per packed split)
      rewriteTable(spark, table)(identity)

    case DetachRe(ifExists, table) =>
      // ClickHouse DETACH removes the table from the catalog but keeps
      // its data for a later ATTACH. Spark's DROP on a managed table
      // deletes the data, so the metadata-only analog is a rename to a
      // reserved hidden name: the public name disappears, the data and
      // schema survive untouched. IF EXISTS on a missing table is a
      // no-op, matching the ClickHouse modifier the regex advertises.
      if (ifExists == null || spark.catalog.tableExists(table))
        spark.sql(s"ALTER TABLE $table RENAME TO $table$DetachedSuffix")

    case AttachRe(ifNotExists, table) =>
      // inverse of DETACH (the bare `ATTACH TABLE t` form). IF NOT
      // EXISTS with the table already attached is a no-op.
      if (ifNotExists == null || !spark.catalog.tableExists(table))
        spark.sql(s"ALTER TABLE $table$DetachedSuffix RENAME TO $table")

    case AttachDefRe(ifNotExists, table, rest) =>
      // Full-definition `ATTACH TABLE t (cols…) ENGINE …`: ClickHouse
      // registers the metadata over whatever table data is on disk.
      // The faithful analog: parked detached data present → re-attach
      // it (the definition restates the schema the data already has);
      // no parked data → CREATE TABLE IF NOT EXISTS with the declared
      // columns (ClickHouse attaching over an empty directory yields an
      // empty table). A migration dir from a real deployment can carry
      // this after manual DETACH maintenance, so erroring was wrong.
      if (ifNotExists != null && spark.catalog.tableExists(table)) ()
      else if (spark.catalog.tableExists(s"$table$DetachedSuffix"))
        spark.sql(s"ALTER TABLE $table$DetachedSuffix RENAME TO $table")
      else
        spark.sql(s"CREATE TABLE IF NOT EXISTS $table (${parseColumnDefs(rest).mkString(", ")}) USING parquet")

    case InsertInfileRe(table, cols, path, format) =>
      // Bulk file ingest. Schema comes from the TARGET table (never
      // inferred — inference samples the file twice and can drift from
      // the DDL), reading only the listed column subset when one is
      // given; unlisted target columns are filled with typed nulls.
      // The read is a plain distributed CSV scan — parallel split
      // reads for plain files; .gz is a single-stream decode per file,
      // the same shape the reference's `gunzip | clickhouse-client`
      // pipe has.
      val target = spark.table(table)
      val wanted =
        if (cols == null) target.schema.fieldNames.toSeq
        else splitTopLevel(cols)
      val readSchema = org.apache.spark.sql.types.StructType(
        wanted.map(c => target.schema(c)))
      val lower = format.toLowerCase
      val df = spark.read
        .option("header", lower.contains("withnames").toString)
        .option("sep", if (lower.startsWith("t")) "\t" else ",")
        .schema(readSchema)
        .csv(path)
      val aligned = target.schema.fields.foldLeft(df) { (acc, f) =>
        if (acc.columns.contains(f.name)) acc
        else acc.withColumn(f.name, lit(null).cast(f.dataType))
      }.select(target.schema.fieldNames.map(col(_)).toIndexedSeq: _*)
      aligned.write.mode(SaveMode.Append).insertInto(table)

    case InsertValuesRe(table, cols, data) =>
      // FORMAT Values carries an ANSI VALUES list verbatim
      val colsPart = if (cols == null) "" else s"($cols) "
      spark.sql(s"INSERT INTO $table $colsPart VALUES $data")

    case other =>
      spark.sql(other) // ANSI fall-through (INSERT, SELECT, …)
  }

  /** Read-modify-rewrite of a catalog table via write-temp-then-swap:
    * the rewritten data lands in a scratch table (a plain distributed
    * parquet write — nothing held in cluster memory, resilient to
    * executor loss), and only after that write fully succeeds does the
    * catalog swap happen (drop original, rename scratch into place).
    * The swap is two catalog metadata operations — a crash between them
    * leaves the complete scratch table recoverable under its suffixed
    * name, never a half-written original (the failure mode of an
    * in-place overwrite). Synchronous by construction — the statement
    * returns only when the swap is complete. The rename also carries the
    * new schema, which ADD/DROP COLUMN rewrites require.
    *
    * The scratch name carries a per-invocation random token, so a real
    * user table that happens to share the scratch prefix is never
    * dropped and concurrent rewrites of the same table cannot collide.
    * A crash before the swap leaves an orphaned
    * `<table>__graft_rewrite_<token>` table — complete, inert, and safe
    * to drop at leisure. Known window: between the DROP of the original
    * and the RENAME of the scratch the name is briefly absent, so a
    * concurrent reader fails with "table not found" rather than seeing
    * stale data (Spark's catalog has no atomic two-table swap). */
  private def rewriteTable(spark: SparkSession, table: String)(f: DataFrame => DataFrame): Unit = {
    val token = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val scratch = s"${table}__graft_rewrite_$token"
    f(spark.table(table)).write.mode(SaveMode.Overwrite).saveAsTable(scratch)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $scratch RENAME TO $table")
  }

  /** Parse the "cols…) tail" of a CREATE/ATTACH definition into Spark
    * `name TYPE` column defs. Manual paren matching: the column block
    * may itself contain parens (Decimal(10,2), FixedString(8)), so
    * regex-to-first-')' would truncate it. Per-column DEFAULT/CODEC/
    * COMMENT clauses keep name + mapped base type only. */
  private def parseColumnDefs(rest: String): Seq[String] = {
    val (colsBlob, _) = splitAtMatchingParen(rest)
    splitTopLevel(colsBlob).map { c =>
      val parts = c.trim.split("\\s+", 2)
      val typePart = parts.lift(1).getOrElse("STRING")
        .split("(?i)\\s+(DEFAULT|CODEC|COMMENT)\\s+", 2)(0)
      s"${parts(0)} ${mapType(typePart)}"
    }
  }

  /** Split "inside(...)rest" at the paren matching the already-consumed
    * opening one; returns (inside, rest). */
  private[migrator] def splitAtMatchingParen(s: String): (String, String) = {
    var depth = 1
    var i = 0
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    (s.substring(0, math.max(0, i - 1)), s.substring(math.min(i, s.length)))
  }

  /** Split a comma-separated list ignoring commas inside parentheses. */
  private[migrator] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c =>
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
