package graft.migrator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ClickHouse-dialect statement translation → Spark actions.
  *
  * Regex-level translation, deliberately not a parser (SURVEY §7.3): the
  * reference forwards SQL text verbatim to ClickHouse
  * (reference: clickhouse_migrate/migrate.py:52) and the dialect surface
  * its fixtures exercise is exactly four shapes:
  *
  *  1. `CREATE DATABASE IF NOT EXISTS db`
  *  2. `CREATE TABLE [IF NOT EXISTS] db.t(col Type, …) ENGINE … [PARTITION BY …] [ORDER BY …]`
  *     (reference: tests/clickhouse_migrations/V1__create_test.sql)
  *  3. `ALTER TABLE t ADD COLUMN c Type DEFAULT v`
  *     (reference: tests/migrations_seq/V1_sequential_dmls.json:2-3)
  *  4. `ALTER TABLE t UPDATE c=v WHERE pred`
  *     (reference: tests/migrations_seq/V1_sequential_dmls.json:4-6)
  *
  * Anything else falls through to `spark.sql` untouched (ANSI text).
  *
  * Scale notes: ALTER…ADD COLUMN / ALTER…UPDATE are whole-table rewrites
  * in a parquet world and are documented as such (SURVEY §2.9). ClickHouse
  * runs them as *asynchronous* mutations; Spark writes are synchronous, so
  * the reference's mutation-completion barrier (`pipelined`,
  * migrate.py:56-71) is deleted by design — executing statements in order
  * IS the barrier (SURVEY §2.10).
  */
object Statements {

  /** ClickHouse → Spark SQL type mapping (signed-type policy, SURVEY §1.2). */
  def mapType(chType: String): String = chType.trim match {
    case t if t.equalsIgnoreCase("UInt8") || t.equalsIgnoreCase("Int8")
           || t.equalsIgnoreCase("UInt16") || t.equalsIgnoreCase("Int16") => "SMALLINT"
    case t if t.equalsIgnoreCase("UInt32") || t.equalsIgnoreCase("Int32") => "INT"
    case t if t.equalsIgnoreCase("UInt64") || t.equalsIgnoreCase("Int64") => "BIGINT"
    case t if t.equalsIgnoreCase("Float32") => "FLOAT"
    case t if t.equalsIgnoreCase("Float64") => "DOUBLE"
    case t if t.equalsIgnoreCase("String") => "STRING"
    case t if t.equalsIgnoreCase("DateTime") => "TIMESTAMP"
    case t if t.equalsIgnoreCase("Date") => "DATE"
    case other => other // already ANSI
  }

  private val CreateDbRe =
    """(?is)^\s*CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*$""".r
  private val CreateTableRe =
    """(?is)^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.*?)\)\s*(ENGINE\b.*)?$""".r
  private val AddColumnRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+(\w+)(?:\s+DEFAULT\s+(.+?))?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+UPDATE\s+(.+?)\s+WHERE\s+(.+?)\s*$""".r

  /** Execute one (possibly ClickHouse-dialect) statement against Spark. */
  def execute(spark: SparkSession, statement: String): Unit = statement match {
    case CreateDbRe(_, db) =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

    case CreateTableRe(ifNotExists, table, colsBlob, _) =>
      val cols = splitTopLevel(colsBlob).map { c =>
        val parts = c.trim.split("\\s+", 2)
        s"${parts(0)} ${mapType(parts.lift(1).getOrElse("STRING"))}"
      }
      val ine = if (ifNotExists != null) "IF NOT EXISTS " else ""
      // ENGINE/PARTITION BY tuple()/ORDER BY tuple() have no Spark meaning
      // (ORDER BY tuple() = unordered = default) — stripped by translation.
      spark.sql(s"CREATE TABLE $ine$table (${cols.mkString(", ")}) USING parquet")

    case AddColumnRe(table, colName, chType, default) =>
      // Whole-table rewrite: read → withColumn(lit(default)) → overwrite.
      val sparkType = mapType(chType)
      val defaultExpr =
        if (default == null) lit(null).cast(sparkType)
        else expr(default).cast(sparkType)
      rewriteTable(spark, table)(_.withColumn(colName, defaultExpr))

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

    case other =>
      spark.sql(other) // ANSI fall-through (INSERT, SELECT, DROP, …)
  }

  /** Read-modify-overwrite of a catalog table. `localCheckpoint` breaks
    * the lineage so Spark permits overwriting the path being read; on a
    * real cluster this would be a checkpoint to reliable storage or a
    * write-temp-then-swap. Synchronous by construction — the statement
    * returns only when the rewrite is complete. */
  private def rewriteTable(spark: SparkSession, table: String)(f: DataFrame => DataFrame): Unit = {
    val rewritten = f(spark.table(table)).localCheckpoint(true)
    // saveAsTable(Overwrite) also updates the catalog schema, which an
    // ADD COLUMN rewrite requires.
    rewritten.write.mode(SaveMode.Overwrite).saveAsTable(table)
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
