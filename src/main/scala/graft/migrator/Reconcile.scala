package graft.migrator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reconciliation query — which migrations still need to run.
  *
  * Faithful Spark re-expression of the reference's `migrations_to_apply`
  * (reference: clickhouse_migrate/migrate.py:26-41): scan the committed
  * ledger, alias to avoid join collisions, cast both sides to int,
  * full-outer equi-join on `version`, then carve the joined relation into
  * absconded / tampered / pending classes with null-test predicates.
  *
  * The whole thing is declarative DataFrame code: Catalyst prunes columns,
  * pushes the null-filters below the join where legal, and picks a
  * broadcast-hash join at ledger cardinality. At 100 TB ledger scale the
  * same plan degrades gracefully to a sort-merge join on `version` — no
  * driver-side collect happens here.
  */
object Reconcile {

  /** Error messages are observable behavior locked in by the reference's
    * tests (reference: tests/test_clickhouse_migration.py:33-51). */
  val MissingMsg =
    "Migrations have gone missing, your code base should not truncate migrations, use migrations to correct older migrations"
  val TamperedMsg =
    "Do not edit migrations once run, use migrations to correct older migrations"

  /** Committed-side projection with collision-avoiding aliases
    * (reference: migrate.py:27 — `SELECT version, script AS c_script, md5 AS c_md5`). */
  def committedView(committed: DataFrame): DataFrame =
    committed.select(
      col("version").cast("int").as("version"),
      col("script").as("c_script"),
      col("md5").as("c_md5"))

  private def incomingView(incoming: DataFrame): DataFrame =
    incoming.select(
      col("version").cast("int").as("version"),
      col("script"),
      col("md5"))

  /** The full-outer reconciliation join (reference: migrate.py:34). */
  def executionStat(committed: DataFrame, incoming: DataFrame): DataFrame =
    committedView(committed).join(incomingView(incoming), Seq("version"), "full_outer")

  /** Committed in the ledger but missing on disk (reference: migrate.py:35). */
  def absconded(stat: DataFrame): DataFrame =
    stat.filter(col("c_md5").isNotNull && col("md5").isNull)

  /** Committed but the on-disk bytes changed (reference: migrate.py:38). */
  def tampered(stat: DataFrame): DataFrame =
    stat.filter(col("c_md5").isNotNull && col("md5").isNotNull && col("md5") =!= col("c_md5"))

  /** On disk but never committed — the pending set (reference: migrate.py:41). */
  def pending(stat: DataFrame): DataFrame =
    stat.filter(col("c_md5").isNull).select("version", "script", "md5")

  /** End-to-end `migrations_to_apply`, including the guard/assertion
    * behaviors (reference: migrate.py:26-41; messages at :31,:37,:40).
    *
    * `committed` must have columns (version, script, md5) — the caller
    * projects the ledger; `incoming` likewise.
    */
  def migrationsToApply(committed: DataFrame, incoming: DataFrame): DataFrame = {
    // one job for both cardinalities (the reference reads them as
    // len(df) on materialized frames, migrate.py:30): union-with-tag →
    // single aggregation instead of two separate count jobs
    val counts = committed.select(lit("c").as("side"))
      .union(incoming.select(lit("i").as("side")))
      .groupBy("side").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCommitted = counts.getOrElse("c", 0L)
    val nIncoming = counts.getOrElse("i", 0L)
    if (nCommitted == 0) return incoming.select("version", "script", "md5")
    if (nIncoming == 0 || nIncoming < nCommitted)
      throw new AssertionError(MissingMsg)
    val stat = executionStat(committed, incoming)
    // both guards in ONE aggregation pass over the join (the reference
    // filters the pandas frame twice, migrate.py:35-40; at scale two
    // passes = two shuffles, so fuse them)
    val guards = stat.agg(
      count(when(col("c_md5").isNotNull && col("md5").isNull, 1)).as("n_absconded"),
      count(when(col("c_md5").isNotNull && col("md5").isNotNull
        && col("md5") =!= col("c_md5"), 1)).as("n_tampered")).head()
    if (guards.getLong(0) > 0) throw new AssertionError(MissingMsg)
    if (guards.getLong(1) > 0) throw new AssertionError(TamperedMsg)
    pending(stat)
  }

  /** Idiomatic anti-join formulation of the pending set — equivalent
    * result, skips materializing the outer join (SURVEY §2.3 J1 note).
    * Preferred shape at scale: a left-anti join never widens rows. */
  def pendingAntiJoin(committed: DataFrame, incoming: DataFrame): DataFrame =
    incomingView(incoming).join(committedView(committed), Seq("version"), "left_anti")
}
