package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join handling: with a heavily skewed join key, adaptive
  * execution splits the oversized partition instead of letting one task
  * run the whole key (the runtime re-plan the engine relies on for
  * skewed keys at 100 TB; salting is the static fallback —
  * TextOps.tokenDocFreqSalted).
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // tiny thresholds so the 90%-one-key side counts as skewed at test scale
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 100k rows, 90% on key 0, ~120B payload → one multi-MB partition
      val skewed = spark.range(100000)
        .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("k"),
          concat(md5(col("id").cast("string")), md5(concat(lit("s"), col("id")))).as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("label"))
      val joined = skewed.join(dim, "k").groupBy("label").count()
      val expected = joined.collect().map(_.getLong(1)).sum
      assert(expected == 100000L * 1 - skewed.filter(col("k") >= 1000).count())
      val adaptivePlan = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptivePlan.isDefined)
      val finalPlan = adaptivePlan.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected skew-split sort-merge join in final plan:\n$finalPlan")
    } finally {
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold").foreach(spark.conf.unset)
    }
  }
}
