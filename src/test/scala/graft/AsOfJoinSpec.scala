package graft

import org.apache.spark.sql.functions._

import graft.plans.{AsOf, AsOfJoinExec}

/** Custom AsOfJoin operator: planner integration, correctness against
  * the window-based formulation, and edge cases. */
class AsOfJoinSpec extends SparkSpec {

  private def events(sf: String) =
    spark.read.parquet(s"/root/testdata/sf$sf/events.parquet")
      .withColumn("us", expr("ts div 1000")) // ns long → µs long

  test("plans through the injected strategy as AsOfJoinExec") {
    val purchases = events("0.001").filter("event_type = 'purchase'")
      .select(col("event_id"), col("user_id"), col("us"))
    val signups = events("0.001").filter("event_type = 'signup'")
      .select(col("event_id").as("s_event_id"), col("user_id").as("s_user_id"),
        col("us").as("s_us"))
    val joined = AsOf.join(purchases, signups,
      "user_id", "s_user_id", "us", "s_us")
    val hasExec = joined.queryExecution.executedPlan.collectFirst {
      case e: AsOfJoinExec => e
    }.isDefined ||
      joined.queryExecution.executedPlan.toString.contains("AsOfJoin")
    assert(hasExec, joined.queryExecution.executedPlan.toString)
  }

  test("matches the window-based as-of formulation on real data") {
    val ev = events("0.01")
    val purchases = ev.filter("event_type = 'purchase'")
      .select(col("event_id"), col("user_id"), col("us"))
    val signups = ev.filter("event_type = 'signup'")
      .select(col("event_id").as("s_event_id"), col("user_id").as("s_user_id"),
        col("us").as("s_us"))
    val custom = AsOf.join(purchases, signups, "user_id", "s_user_id", "us", "s_us")
      .select(col("event_id"), col("s_event_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // window twin (the shape asof_join_signup uses, oracle-checked)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val windowed = ev.filter(col("event_type").isin("signup", "purchase"))
      .withColumn("last_signup_id",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("last_signup_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(custom.size == windowed.size)
    assert(custom == windowed)
    assert(custom.valuesIterator.exists(_ == -1L) ||
      custom.valuesIterator.forall(_ >= 0)) // sanity: nulls representable
  }

  test("left rows before any right row get nulls; ties match") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 50L), (4L, 99L, 10L))
      .toDF("lid", "k", "t")
    val r = Seq((101L, 10L, 150L), (102L, 10L, 200L), (103L, 20L, 60L))
      .toDF("rid", "rk", "rt")
    val out = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select("lid", "rid")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(out == Map(
      1L -> -1L,   // t=100 before first right (150)
      2L -> 102L,  // tie rt=200 <= t=200 matches, latest wins
      3L -> -1L,   // t=50 before rt=60
      4L -> -1L))  // key with no right rows
  }
}
