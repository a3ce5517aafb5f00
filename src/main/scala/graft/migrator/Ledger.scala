package graft.migrator

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The migration ledger as an append-only parquet table.
  *
  * Mirrors the reference's `schema_versions` MergeTree table
  * (reference: clickhouse_migrate/migrate.py:23). `DEFAULT now()` becomes
  * `current_timestamp()` at append time; `ORDER BY tuple(created_at)` is
  * cosmetic in the reference (correctness never depends on it) and maps
  * to `sortWithinPartitions` on write.
  *
  * Append-only parquet is the honest at-least-once analog of the
  * reference's non-transactional INSERT (SURVEY §3.3): a crash between
  * statement execution and ledger append leaves a half-applied,
  * unrecorded version in both systems.
  */
final class Ledger(spark: SparkSession, path: String) {

  val schema: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("md5", StringType),
    StructField("script", StringType),
    StructField("created_at", TimestampType)))

  /** CREATE TABLE IF NOT EXISTS (reference: migrate.py:22-23). */
  def init(): Unit =
    if (!Files.exists(Paths.get(path)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode(SaveMode.Overwrite).parquet(path)

  def read(): DataFrame = spark.read.schema(schema).parquet(path)

  /** Committed view for reconciliation: (version, script, md5) — drops
    * created_at, the one deliberate column-pruning decision in the
    * reference (migrate.py:27). */
  def committed(): DataFrame = read().select("version", "script", "md5")

  /** Ledger INSERT (reference: migrate.py:53-54); created_at defaulted
    * here like the server-side `DEFAULT now()`. */
  def append(m: Migration): Unit = {
    import spark.implicits._
    Seq((m.version, m.md5, m.script))
      .toDF("version", "md5", "script")
      .withColumn("created_at", current_timestamp())
      .sortWithinPartitions("created_at")
      .write.mode(SaveMode.Append).parquet(path)
  }
}
