package graft

import graft.migrator.Statements

/** Dialect-translation unit tests: type mapping incl. wrappers, nested
  * parens in DDL, and the full DML shape set over a live catalog table.
  */
class StatementsSpec extends SparkSpec {

  test("type mapping: base, wrappers, parameterized") {
    assert(Statements.mapType("UInt32") == "INT")
    assert(Statements.mapType("Int64") == "BIGINT")
    assert(Statements.mapType("String") == "STRING")
    assert(Statements.mapType("DateTime") == "TIMESTAMP")
    assert(Statements.mapType("DateTime64(3)") == "TIMESTAMP")
    assert(Statements.mapType("Float64") == "DOUBLE")
    assert(Statements.mapType("Nullable(UInt32)") == "INT")
    assert(Statements.mapType("LowCardinality(String)") == "STRING")
    assert(Statements.mapType("LowCardinality(Nullable(String))") == "STRING")
    assert(Statements.mapType("Decimal(10,2)") == "DECIMAL(10,2)")
    assert(Statements.mapType("FixedString(8)") == "STRING")
    assert(Statements.mapType("Date32") == "DATE")
  }

  test("create table with parameterized types and engine clause") {
    spark.sql("CREATE DATABASE IF NOT EXISTS st")
    Statements.execute(spark,
      """CREATE TABLE st.typed(id UInt64, price Decimal(10,2),
         tag LowCardinality(String), at DateTime64(3))
         ENGINE MergeTree PARTITION BY tuple() ORDER BY tuple()""")
    val schema = spark.table("st.typed").schema
    assert(schema("id").dataType.sql == "BIGINT")
    assert(schema("price").dataType.sql == "DECIMAL(10,2)")
    assert(schema("tag").dataType.sql == "STRING")
    assert(schema("at").dataType.sql == "TIMESTAMP")
  }

  test("full DML shape set against a live table") {
    spark.sql("CREATE DATABASE IF NOT EXISTS st")
    Statements.execute(spark,
      "CREATE TABLE st.dml(id UInt32, name String) ENGINE MergeTree")
    spark.sql(
      "INSERT INTO st.dml SELECT id, concat('n', id) FROM (SELECT explode(sequence(1, 100)) AS id)")

    Statements.execute(spark, "ALTER TABLE st.dml ADD COLUMN flag UInt32 DEFAULT 1")
    assert(spark.table("st.dml").filter("flag = 1").count() == 100)

    Statements.execute(spark, "ALTER TABLE st.dml UPDATE flag=0 WHERE id > 50")
    assert(spark.table("st.dml").filter("flag = 0").count() == 50)

    Statements.execute(spark, "ALTER TABLE st.dml DELETE WHERE id > 90")
    assert(spark.table("st.dml").count() == 90)

    Statements.execute(spark, "ALTER TABLE st.dml DROP COLUMN flag")
    assert(!spark.table("st.dml").columns.contains("flag"))

    Statements.execute(spark, "RENAME TABLE st.dml TO st.dml2")
    assert(spark.table("st.dml2").count() == 90)

    Statements.execute(spark, "TRUNCATE TABLE st.dml2")
    assert(spark.table("st.dml2").count() == 0)
    assert(spark.table("st.dml2").columns.toSeq == Seq("id", "name"))

    Statements.execute(spark, "DROP TABLE IF EXISTS st.dml2")
    assert(!spark.catalog.tableExists("st.dml2"))
  }
}
