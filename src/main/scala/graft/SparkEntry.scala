package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog maps one named query per operator row of SURVEY §2 plus
  * the LLM-data-pipeline extensions (dedup / similarity / text / events /
  * multimodal). Every entry with a DuckDB-expressible oracle appears in
  * [[oracleSql]] with identical column names and exact-parity numerics
  * (see [[graft.ops.Tables]] for the policy).
  */
object SparkEntry {

  /** Flagship: the reconciliation query (reference:
    * clickhouse_migrate/migrate.py:26-41) — pending migrations via the
    * full-outer-join shape, on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    MigrationOps.reconcilePending(spark, "/root/testdata/sf0.001")

  private val all: Seq[(String, (SparkSession, String) => DataFrame)] =
    Relational.queries ++ MigrationOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ TextOps.queries ++ EventOps.queries ++
      MultimodalOps.queries ++ LayoutOps.queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = all.toMap

  def oracleSql: Map[String, String] =
    (Relational.oracles ++ MigrationOps.oracles ++ DedupOps.oracles ++
      SimilarityOps.oracles ++ TextOps.oracles ++ EventOps.oracles ++
      MultimodalOps.oracles ++ LayoutOps.oracles).toMap
}
