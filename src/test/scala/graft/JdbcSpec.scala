package graft

import org.apache.spark.sql.SaveMode

import graft.sources.Jdbc

/** JDBC sink/source roundtrip against embedded Derby (in-JVM database —
  * the same DataSource code path a ClickHouse/Postgres JDBC URL takes).
  */
class JdbcSpec extends SparkSpec {

  private lazy val url = s"jdbc:derby:$scratch/derbydb;create=true"

  test("parallel write + partitioned read roundtrip") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val n = orders.count()
    Jdbc.write(orders, url, "ORDERS_JDBC", SaveMode.Overwrite, connections = 4,
      columnTypes = Some("o_orderstatus VARCHAR(10)"))

    val back = Jdbc.readPartitioned(spark, url, "ORDERS_JDBC",
      partitionColumn = "o_orderkey", lowerBound = 0L, upperBound = 1500L,
      numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4) // range-sharded scan
    assert(back.count() == n)
    // predicate pushdown reaches the JDBC source (generated WHERE)
    val filtered = back.filter("o_orderstatus = 'F'")
    val expected = orders.filter("o_orderstatus = 'F'").count()
    assert(filtered.count() == expected)
    val pushed = filtered.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") || pushed.contains("Filter"))
  }

  test("append mode accumulates batches like repeated bulk inserts") {
    val slice = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    Jdbc.write(slice, url, "REGION_JDBC", SaveMode.Overwrite, connections = 1)
    Jdbc.write(slice, url, "REGION_JDBC", SaveMode.Append, connections = 1)
    assert(Jdbc.read(spark, url, "REGION_JDBC").count() == slice.count() * 2)
  }
}
