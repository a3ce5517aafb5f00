package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the ETL leg of the engine (the reference's whole
  * job is moving schema+data into a database over a wire protocol;
  * Spark's equivalent is the JDBC DataSource, reference:
  * clickhouse_migrate/migrate.py:18-19 get_connection +
  * tests/test_clickhouse_migration.py:101 bulk insert).
  *
  * Scale knobs surfaced explicitly because they decide whether a 100 TB
  * transfer works at all:
  *  - write: `batchsize` (rows per INSERT batch), `numPartitions`
  *    (parallel connections — repartition first; every partition is one
  *    connection, so 10k partitions would DDoS the target);
  *  - read: partitioned scans via (partitionColumn, lowerBound,
  *    upperBound, numPartitions) so each executor reads a key range —
  *    without them a JDBC read is a single-threaded scan;
  *  - predicate pushdown: Catalyst pushes filters into the generated
  *    WHERE clause automatically.
  */
object Jdbc {

  /** Parallel JDBC write. `connections` caps concurrent connections. */
  def write(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Append,
      connections: Int = 8,
      batchSize: Int = 10000,
      columnTypes: Option[String] = None,
      props: Properties = new Properties()): Unit = {
    val w = df.repartition(connections)
      .write.mode(mode)
      .option("batchsize", batchSize.toLong.toString)
    // target-dialect DDL control, e.g. "status VARCHAR(10)" — some
    // dialects default StringType to CLOB/TEXT which can't be compared
    // or indexed
    columnTypes.foreach(ct => w.option("createTableColumnTypes", ct))
    w.jdbc(url, table, props)
  }

  /** Partitioned (range-sharded) JDBC read: numPartitions concurrent
    * range queries over partitionColumn. */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int = 8,
      props: Properties = new Properties()): DataFrame =
    spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .jdbc(url, table, props)

  /** Single-connection read (metadata/small tables only). */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)
}
