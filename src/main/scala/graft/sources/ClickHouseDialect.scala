package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** ClickHouse JDBC dialect — the write leg of the reference's job
  * (migrate.py:18-19 opens a ClickHouse connection; every statement it
  * issues lands on MergeTree tables like `schema_versions(version
  * UInt32, md5 String, script String, created_at DateTime) ENGINE =
  * MergeTree ORDER BY tuple(created_at)`, migrate.py:23). Spark's JDBC
  * DataSource is dialect-driven: without this object a ClickHouse URL
  * falls back to NoopDialect and emits ANSI-ish DDL (`TEXT`,
  * `TIMESTAMP`) that ClickHouse rejects, and UInt64 columns read back
  * as overflowed signed longs.
  *
  * Type policy (SURVEY §1.2): Spark has no unsigned ints, so the WRITE
  * map is all-signed (`IntegerType → Int32`, never UInt32 — emulating
  * unsigned wraparound like the reference's `guard UInt32 DEFAULT -1 →
  * 4294967295` wart is explicitly out of scope), while the READ map
  * widens each unsigned type to the next signed Spark type that holds
  * its full range: UInt8→Short, UInt16→Int, UInt32→Long,
  * UInt64→Decimal(20,0).
  *
  * Offline caveat: no live ClickHouse server exists in this sandbox, so
  * the dialect is spec-locked at the DDL/type-map layer
  * (ClickHouseDialectSpec) the same way Statements is; the wire path is
  * the stock Spark JDBC writer already exercised against Derby in
  * JdbcSpec.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:clickhouse:") || url.startsWith("jdbc:ch:")

  /** Spark → ClickHouse DDL types (write path, all-signed policy).
    * Booleans write as ClickHouse's native `Bool` (not the UInt8
    * convention) so the type ROUND-TRIPS: the read map sends UInt8 to
    * ShortType (it may hold 0..255 from foreign tables), and a boolean
    * column written as UInt8 would come back Short. */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case BooleanType => Some(JdbcType("Bool", Types.BOOLEAN))
    case ByteType => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType => Some(JdbcType("Int32", Types.INTEGER))
    case LongType => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType => Some(JdbcType("Float64", Types.DOUBLE))
    case StringType => Some(JdbcType("String", Types.VARCHAR))
    // ClickHouse stores arbitrary bytes in String (no BLOB type)
    case BinaryType => Some(JdbcType("String", Types.BINARY))
    // Date32 covers the full Spark date range; plain Date stops at 2149
    case DateType => Some(JdbcType("Date32", Types.DATE))
    // DateTime64(6) = microsecond precision, matching Spark's timestamp
    // resolution; plain DateTime is second-precision and would truncate
    case TimestampType => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case TimestampNTZType => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case d: DecimalType =>
      Some(JdbcType(s"Decimal(${d.precision}, ${d.scale})", Types.DECIMAL))
    case ArrayType(et, containsNull) =>
      getJDBCType(et).map { inner =>
        val elem =
          if (containsNull && nullableWrappable(et)) s"Nullable(${inner.databaseTypeDefinition})"
          else inner.databaseTypeDefinition
        JdbcType(s"Array($elem)", Types.ARRAY)
      }
    case _ => None
  }

  // ClickHouse forbids Nullable(Array(...)) and Nullable inside certain
  // composite types; only wrap scalars
  private def nullableWrappable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  /** ClickHouse → Spark types (read path, unsigned types widened). */
  override def getCatalystType(
      sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    chTypeToCatalyst(stripModifiers(typeName))

  /** Peel Nullable(...) / LowCardinality(...) wrappers — JDBC drivers
    * report the full ClickHouse type string. */
  private def stripModifiers(t: String): String = {
    val s = t.trim
    if (s.startsWith("Nullable(") && s.endsWith(")"))
      stripModifiers(s.substring("Nullable(".length, s.length - 1))
    else if (s.startsWith("LowCardinality(") && s.endsWith(")"))
      stripModifiers(s.substring("LowCardinality(".length, s.length - 1))
    else s
  }

  private val DecimalRe = """Decimal\((\d+)\s*,\s*(\d+)\)""".r
  private val FixedStringRe = """FixedString\(\d+\)""".r
  private val DateTime64Re = """DateTime64\(\d+(?:\s*,\s*'[^']*')?\)""".r
  private val DateTimeTzRe = """DateTime\('[^']*'\)""".r
  private val ArrayRe = """Array\((.+)\)""".r

  private def chTypeToCatalyst(t: String): Option[DataType] = t match {
    case "Int8" => Some(ByteType)
    case "Int16" => Some(ShortType)
    case "Int32" => Some(IntegerType)
    case "Int64" => Some(LongType)
    // unsigned widening: smallest signed Spark type holding the range
    case "UInt8" => Some(ShortType)
    case "UInt16" => Some(IntegerType)
    case "UInt32" => Some(LongType)
    case "UInt64" => Some(DecimalType(20, 0))
    case "Int128" | "UInt128" | "Int256" | "UInt256" =>
      Some(DecimalType(38, 0)) // best-effort; overflow raises, not wraps
    case "Float32" => Some(FloatType)
    case "Float64" => Some(DoubleType)
    case "String" | "UUID" | "IPv4" | "IPv6" => Some(StringType)
    case FixedStringRe() => Some(StringType)
    case s if s.startsWith("Enum8(") || s.startsWith("Enum16(") =>
      Some(StringType)
    case "Bool" => Some(BooleanType)
    case "Date" | "Date32" => Some(DateType)
    case "DateTime" => Some(TimestampType)
    case DateTimeTzRe() => Some(TimestampType)
    case DateTime64Re() => Some(TimestampType)
    case DecimalRe(p, s) => Some(DecimalType(p.toInt, s.toInt))
    case ArrayRe(inner) =>
      chTypeToCatalyst(stripModifiers(inner)).map(ArrayType(_, containsNull = true))
    case _ => None
  }

  // ClickHouse quotes identifiers with backticks (like MySQL)
  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  override def getTableExistsQuery(table: String): String =
    s"SELECT * FROM $table WHERE 1=0"

  override def getTruncateQuery(
      table: String, cascade: Option[Boolean]): String =
    s"TRUNCATE TABLE $table"

  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  override def getSchemaQuery(table: String): String =
    s"SELECT * FROM $table WHERE 1=0"

  // ---------------------------------------------------------------------
  // CREATE-with-ENGINE emission. Spark's JDBC writer appends the string
  // from `.option("createTableOptions", ...)` after the column list —
  // ClickHouse is exactly the dialect that NEEDS it (a MergeTree table
  // without ENGINE/ORDER BY is a syntax error). These helpers build both
  // that option string and, for direct-statement use (Statements-style),
  // the full CREATE TABLE text.
  // ---------------------------------------------------------------------

  /** `ENGINE = MergeTree() ORDER BY (...) [PARTITION BY ...]` — pass to
    * `.option("createTableOptions", ...)` on a JDBC write. An empty
    * orderBy emits `ORDER BY tuple()` (the reference ledger's own shape,
    * migrate.py:23 uses `ORDER BY tuple(created_at)`). */
  def createTableOptions(
      engine: String = "MergeTree()",
      orderBy: Seq[String] = Nil,
      partitionBy: Option[String] = None): String = {
    val order =
      if (orderBy.isEmpty) "tuple()"
      else orderBy.map(quoteIdentifier).mkString("(", ", ", ")")
    val part = partitionBy.map(p => s" PARTITION BY $p").getOrElse("")
    s"ENGINE = $engine$part ORDER BY $order"
  }

  /** Column list in ClickHouse DDL syntax: nullable fields wrap in
    * `Nullable(...)` (ClickHouse columns are NOT NULL by default — the
    * inverse of ANSI, which is why the stock writer's `NOT NULL` suffix
    * convention cannot express this dialect). */
  def ddlColumns(schema: StructType): String =
    schema.fields.map { f =>
      val t = getJDBCType(f.dataType).getOrElse(
        throw new IllegalArgumentException(
          s"ClickHouseDialect: no ClickHouse type for ${f.dataType.sql} " +
            s"(column ${f.name})"))
      val typ =
        if (f.nullable && nullableWrappable(f.dataType))
          s"Nullable(${t.databaseTypeDefinition})"
        else t.databaseTypeDefinition
      s"${quoteIdentifier(f.name)} $typ"
    }.mkString(", ")

  /** Full `CREATE TABLE IF NOT EXISTS` text for direct statement
    * execution (the Statements.scala path). */
  def createTableSql(
      table: String,
      schema: StructType,
      engine: String = "MergeTree()",
      orderBy: Seq[String] = Nil,
      partitionBy: Option[String] = None): String =
    s"CREATE TABLE IF NOT EXISTS $table (${ddlColumns(schema)}) " +
      createTableOptions(engine, orderBy, partitionBy)

  /** Idempotent global registration with Spark's dialect registry. */
  def register(): Unit = {
    // registerDialect prepends; repeated calls would shadow but not
    // break — still, keep it single-shot for cleanliness
    JdbcDialects.unregisterDialect(this)
    JdbcDialects.registerDialect(this)
  }
}
