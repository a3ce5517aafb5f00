package graft.migrator

import scala.collection.mutable

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-statement execution metrics during the apply loop — the honest
  * analog of the reference's mutation monitoring
  * (reference: clickhouse_migrate/migrate.py:64-71). ClickHouse runs
  * mutations asynchronously, so the reference polls `system.mutations`
  * for in-flight progress; Spark statements are synchronous, so the
  * idiomatic observability surface is a [[QueryExecutionListener]] that
  * reports rows/bytes/wall-clock per executed statement as each
  * completes. Registered by [[Apply.applyMigrations]] when a listener is
  * passed; zero overhead otherwise.
  */
object Observability {

  /** One query execution observed during apply.
    *
    * `label` is the statement (or `ledger:<version>` append) that
    * produced the execution — exact, because the apply loop drains the
    * listener bus after each statement before relabeling. One statement
    * can produce several executions (a table rewrite is
    * write-temp + swap). */
  final case class StatementMetrics(
      label: String,
      funcName: String,
      rows: Option[Long],
      bytes: Option[Long],
      durationNs: Long,
      failed: Boolean)

  final class MigrationListener extends QueryExecutionListener {
    @volatile private[migrator] var currentLabel: String = ""
    private val buf = mutable.ArrayBuffer[StatementMetrics]()

    def entries: Seq[StatementMetrics] = synchronized(buf.toSeq)

    /** First plan node (top-down) exposing the metric: for writes that is
      * the write command (numOutputRows/numOutputBytes of the committed
      * files), for reads the root operator's output rows. */
    private def metric(qe: QueryExecution, name: String): Option[Long] =
      qe.executedPlan.collectFirst {
        case p if p.metrics.contains(name) && p.metrics(name).value >= 0 =>
          p.metrics(name).value
      }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val m = StatementMetrics(currentLabel, funcName,
        metric(qe, "numOutputRows"), metric(qe, "numOutputBytes"),
        durationNs, failed = false)
      synchronized(buf += m)
    }

    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      synchronized(buf +=
        StatementMetrics(currentLabel, funcName, None, None, -1L, failed = true))
  }
}
