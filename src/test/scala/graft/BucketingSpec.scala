package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Scale-posture proof: bucketing both sides of a join on the join key
  * eliminates the shuffle entirely — the plan contains zero
  * ShuffleExchange operators. This is the co-located-join strategy the
  * engine prescribes for repeated large-table joins at 100 TB
  * (SURVEY §7.3: pre-partitioning/bucketing for co-located joins).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join has no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    // force the sort-merge path (tiny test tables would broadcast) and a
    // static plan we can inspect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bkt.orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bkt.lineitem_b")

    val joined = spark.table("bkt.lineitem_b")
      .join(spark.table("bkt.orders_b"),
        spark.table("bkt.lineitem_b")("l_orderkey") === spark.table("bkt.orders_b")("o_orderkey"))
      .groupBy("o_orderstatus").count()

    val plan = joined.queryExecution.executedPlan
    val shufflesBeforeAgg = plan.collect { case e: ShuffleExchangeExec => e }
    // the only legal exchange is the final tiny groupBy on orderstatus;
    // the join itself must be shuffle-free
    assert(shufflesBeforeAgg.length <= 1,
      s"expected at most the aggregation exchange, got:\n${plan.treeString}")
    val joinNode = plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joinNode.isDefined, "expected a sort-merge join over bucketed tables")
    val shufflesUnderJoin = joinNode.get.collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle:\n${joinNode.get.treeString}")
    // and the result is correct
    val total = joined.collect().map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"$dir/lineitem.parquet").count())
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
