package graft

import org.apache.spark.sql.functions._

/** Accuracy contract for the one rows-only catalog entry.
  *
  * `approx_distinct` (HLL++ sketches) has no DuckDB oracle by design —
  * sketch estimates are engine-specific — so the correctness gate only
  * row-counts it. This spec is the missing accuracy check: every
  * estimate must fall within the documented relative-error envelope of
  * the exact `agg_distinct`-style twin computed over the same groups
  * and columns. Spark's `approx_count_distinct` default rsd is 0.05
  * (one standard deviation); 3×rsd = 15% is the conventional envelope,
  * and the sketch is deterministic for fixed input, so this is a
  * stable bound, not a flaky statistical test.
  */
class ApproxDistinctSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val MaxRelErr = 0.15 // 3 × default rsd (0.05)

  test("approx_distinct estimates fall within 3x rsd of the exact twin") {
    val approx = ops.Relational.approxDistinct(spark, dir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("approx_orders"), r.getAs[Long]("approx_parts"))).toMap
    val exact = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("orders"),
        countDistinct(col("l_partkey")).as("parts"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("orders"), r.getAs[Long]("parts"))).toMap

    assert(approx.keySet == exact.keySet,
      s"group mismatch: ${approx.keySet} vs ${exact.keySet}")
    approx.foreach { case (flag, (aOrders, aParts)) =>
      val (eOrders, eParts) = exact(flag)
      val errOrders = math.abs(aOrders - eOrders).toDouble / eOrders
      val errParts = math.abs(aParts - eParts).toDouble / eParts
      assert(errOrders <= MaxRelErr,
        s"group $flag: approx_orders=$aOrders exact=$eOrders relErr=$errOrders")
      assert(errParts <= MaxRelErr,
        s"group $flag: approx_parts=$aParts exact=$eParts relErr=$errParts")
    }
  }
}
