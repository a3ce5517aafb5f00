package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Minimal bridge into `private[sql]` constructors: building a DataFrame
  * from a custom LogicalPlan requires `Dataset.ofRows`, which Spark
  * deliberately keeps internal. Extension libraries conventionally host
  * a bridge in the org.apache.spark.sql namespace for exactly this
  * (same approach as public Spark connector/extension projects).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Whether a planner strategy of the given class is registered in
    * this session (extension-injected strategies live in the session
    * state's planner, which is `private[sql]`). Lets programmatic
    * operators that REQUIRE their strategy fail with a clear
    * "register the extension" message instead of a planner assertion. */
  def hasStrategy(spark: SparkSession, strategyClass: Class[_]): Boolean =
    spark.asInstanceOf[ClassicSession].sessionState.planner.strategies
      .exists(s => strategyClass.isInstance(s))

  /** Block until the listener bus has delivered all posted events
    * (`private[spark]` in LiveListenerBus). Used by the migration
    * observability listener to make per-statement metric attribution
    * exact: the sequential apply loop drains the bus before moving to
    * the next statement's label. */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long = 30000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
}
