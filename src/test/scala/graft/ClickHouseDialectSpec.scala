package graft

import java.sql.Types

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ClickHouseDialect

/** Spec-lock for the ClickHouse JDBC dialect (no live server offline —
  * same policy as StatementsSpec: the DDL/type-map layer is the
  * contract; the wire path is the stock Spark JDBC writer already
  * exercised against Derby in JdbcSpec).
  */
class ClickHouseDialectSpec extends AnyFunSuite {

  private val d = ClickHouseDialect

  test("canHandle matches clickhouse jdbc url schemes only") {
    assert(d.canHandle("jdbc:clickhouse://host:8123/db"))
    assert(d.canHandle("jdbc:ch://host:8123/db"))
    assert(!d.canHandle("jdbc:derby:memory:db"))
    assert(!d.canHandle("jdbc:postgresql://host/db"))
  }

  test("write map is all-signed (SURVEY §1.2 policy: never emit UInt32)") {
    def ch(dt: DataType): String = d.getJDBCType(dt).get.databaseTypeDefinition
    assert(ch(IntegerType) == "Int32")
    assert(ch(LongType) == "Int64")
    assert(ch(ShortType) == "Int16")
    assert(ch(ByteType) == "Int8")
    // native Bool, not the UInt8 convention: UInt8 reads back as Short
    // (foreign tables may hold 0..255), so only Bool round-trips
    assert(ch(BooleanType) == "Bool")
    assert(ch(FloatType) == "Float32")
    assert(ch(DoubleType) == "Float64")
    assert(ch(StringType) == "String")
    assert(ch(BinaryType) == "String")
    assert(ch(DateType) == "Date32")
    assert(ch(TimestampType) == "DateTime64(6)") // micros, not DateTime's seconds
    assert(ch(DecimalType(18, 4)) == "Decimal(18, 4)")
    assert(ch(ArrayType(FloatType, containsNull = false)) == "Array(Float32)")
    assert(ch(ArrayType(StringType, containsNull = true)) == "Array(Nullable(String))")
    // nested arrays never get Nullable() wrapping (ClickHouse forbids it)
    assert(ch(ArrayType(ArrayType(IntegerType, false), containsNull = true))
      == "Array(Array(Int32))")
    assert(d.getJDBCType(MapType(StringType, StringType)).isEmpty)
  }

  test("read map widens unsigned types to the smallest signed holder") {
    def cat(t: String): DataType =
      d.getCatalystType(Types.OTHER, t, 0, new MetadataBuilder).get
    assert(cat("UInt8") == ShortType)
    assert(cat("UInt16") == IntegerType)
    assert(cat("UInt32") == LongType) // 4294967295 does not fit Int32
    assert(cat("UInt64") == DecimalType(20, 0))
    assert(cat("Int32") == IntegerType)
    assert(cat("Int64") == LongType)
    assert(cat("Float64") == DoubleType)
    assert(cat("String") == StringType)
    assert(cat("FixedString(16)") == StringType)
    assert(cat("UUID") == StringType)
    assert(cat("Date") == DateType)
    assert(cat("Date32") == DateType)
    assert(cat("DateTime") == TimestampType)
    assert(cat("DateTime64(3)") == TimestampType)
    assert(cat("DateTime64(3, 'UTC')") == TimestampType)
    assert(cat("Decimal(20, 0)") == DecimalType(20, 0))
    assert(cat("Enum8('a' = 1, 'b' = 2)") == StringType)
    // wrapper modifiers strip recursively
    assert(cat("Nullable(UInt32)") == LongType)
    assert(cat("LowCardinality(Nullable(String))") == StringType)
    assert(cat("Array(Nullable(UInt32))") == ArrayType(LongType, containsNull = true))
    assert(d.getCatalystType(Types.OTHER, "AggregateFunction(sum, UInt64)",
      0, new MetadataBuilder).isEmpty)
  }

  test("ledger DDL round-trips the reference's schema_versions shape") {
    // migrate.py:23: (version UInt32, md5 String, script String,
    // created_at DateTime) ENGINE = MergeTree ORDER BY tuple(created_at)
    // — our signed-policy emission of the same table:
    val ledger = StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("md5", StringType, nullable = false),
      StructField("script", StringType, nullable = false),
      StructField("created_at", TimestampType, nullable = false)))
    val sql = d.createTableSql("db.schema_versions", ledger,
      orderBy = Seq("created_at"))
    assert(sql ==
      "CREATE TABLE IF NOT EXISTS db.schema_versions " +
        "(`version` Int32, `md5` String, `script` String, " +
        "`created_at` DateTime64(6)) " +
        "ENGINE = MergeTree() ORDER BY (`created_at`)")
  }

  test("nullable columns wrap in Nullable(), not ANSI NOT NULL suffixes") {
    val t = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("tags", ArrayType(StringType), nullable = true)))
    val cols = d.ddlColumns(t)
    assert(cols == "`id` Int64, `name` Nullable(String), `tags` Array(Nullable(String))")
    assert(!cols.contains("NOT NULL"))
  }

  test("createTableOptions emits ENGINE / ORDER BY / PARTITION BY") {
    assert(d.createTableOptions() == "ENGINE = MergeTree() ORDER BY tuple()")
    assert(d.createTableOptions(orderBy = Seq("ts", "id"),
      partitionBy = Some("toYYYYMM(ts)"))
      == "ENGINE = MergeTree() PARTITION BY toYYYYMM(ts) ORDER BY (`ts`, `id`)")
    assert(d.createTableOptions(engine = "ReplacingMergeTree(ver)",
      orderBy = Seq("id"))
      == "ENGINE = ReplacingMergeTree(ver) ORDER BY (`id`)")
  }

  test("identifier quoting is backtick-doubled, truncate is non-cascading") {
    assert(d.quoteIdentifier("weird`col") == "`weird``col`")
    assert(d.getTruncateQuery("db.t", None) == "TRUNCATE TABLE db.t")
    assert(d.isCascadingTruncateTable().contains(false))
  }

  test("registered dialect is resolved for clickhouse urls by Spark's registry") {
    ClickHouseDialect.register()
    assert(JdbcDialects.get("jdbc:clickhouse://host:8123/db") eq ClickHouseDialect)
    // and derby (JdbcSpec's embedded target) still resolves elsewhere
    assert(JdbcDialects.get("jdbc:derby:memory:x") ne ClickHouseDialect)
  }

  test("unsupported write type fails loud with the column name") {
    val err = intercept[IllegalArgumentException] {
      d.ddlColumns(StructType(Seq(
        StructField("m", MapType(StringType, LongType)))))
    }
    assert(err.getMessage.contains("m"))
  }
}
