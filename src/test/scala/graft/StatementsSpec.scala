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

  test("OPTIMIZE TABLE compacts without changing data") {
    spark.sql("CREATE DATABASE IF NOT EXISTS st")
    Statements.execute(spark,
      "CREATE TABLE st.opt(id UInt32, name String) ENGINE MergeTree")
    spark.sql(
      "INSERT INTO st.opt SELECT id, concat('n', id) FROM (SELECT explode(sequence(1, 500)) AS id)")
    val before = spark.table("st.opt").orderBy("id").collect().toSeq
    Statements.execute(spark, "OPTIMIZE TABLE st.opt")
    assert(spark.table("st.opt").orderBy("id").collect().toSeq == before)
    Statements.execute(spark, "OPTIMIZE TABLE st.opt FINAL")
    assert(spark.table("st.opt").count() == 500)
    spark.sql("DROP TABLE st.opt")
  }

  test("DETACH hides the table, ATTACH restores it with data intact") {
    spark.sql("CREATE DATABASE IF NOT EXISTS st")
    Statements.execute(spark,
      "CREATE TABLE st.det(id UInt32) ENGINE MergeTree")
    spark.sql("INSERT INTO st.det SELECT explode(sequence(1, 42)) AS id")
    Statements.execute(spark, "DETACH TABLE st.det")
    assert(!spark.catalog.tableExists("st.det"))
    Statements.execute(spark, "ATTACH TABLE st.det")
    assert(spark.catalog.tableExists("st.det"))
    assert(spark.table("st.det").count() == 42)
    spark.sql("DROP TABLE st.det")
  }

  test("unknown statements still fall through to spark.sql") {
    spark.sql("CREATE DATABASE IF NOT EXISTS st")
    Statements.execute(spark, "CREATE OR REPLACE TEMP VIEW st_fallthrough AS SELECT 7 AS x")
    assert(spark.table("st_fallthrough").collect()(0).getInt(0) == 7)
  }
}
