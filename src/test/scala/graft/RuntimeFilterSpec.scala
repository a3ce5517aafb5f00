package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the engine lever that cuts the
  * FACT side of a selective dim-fact join before its shuffle: Catalyst
  * builds a bloom filter from the filtered creation side and injects
  * `might_contain(...)` into the application side's scan filter, so
  * rows that cannot match never enter the exchange. At 100 TB this is
  * the difference between shuffling the whole fact table and shuffling
  * the ~matching fraction; the thresholds that gate injection
  * (`creationSideThreshold`, `applicationSideScanSizeThreshold`)
  * default to 10 MB / 10 GB — sized for clusters, so the spec lowers
  * the application-side floor to demonstrate the mechanism at test
  * scale. Broadcast joins are disabled in the probe session because a
  * broadcast build side already prunes at the hash lookup — the bloom
  * filter targets the shuffle-join regime where neither side is
  * driver-resident.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def probeSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  test("a selective dim filter injects might_contain pruning on the fact scan") {
    val s = probeSession()
    val dir = "/root/testdata/sf0.01"
    val ord = s.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority").count()
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("bloom_filter_agg"), plan)
    // the filter must sit on the APPLICATION (lineitem) side, keyed on
    // its join column — pre-shuffle row pruning, not a post-join check
    assert(plan.matches("(?s).*might_contain.*l_orderkey.*"), plan)
  }

  test("pruning preserves the join result exactly") {
    val s = probeSession()
    val dir = "/root/testdata/sf0.01"
    def result(sess: org.apache.spark.sql.SparkSession) = {
      val ord = sess.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = sess.read.parquet(s"$dir/lineitem.parquet")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").count().collect().map(_.toSeq).toSet
    }
    assert(result(s) == result(spark)) // bloom-pruned == default session
  }

  test("no injection without a selective creation-side predicate") {
    val s = probeSession()
    val dir = "/root/testdata/sf0.01"
    val ord = s.read.parquet(s"$dir/orders.parquet") // unfiltered: nothing to gain
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderstatus").count()
    j.collect()
    assert(!j.queryExecution.executedPlan.toString.contains("might_contain"))
  }
}
