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
}
