package graft

import org.apache.spark.sql.functions._

/** The native array_tf expression and the in-row text_repetition plan
  * built on it: exact count semantics (delimiter-bearing elements, null
  * skip, empty array), row-for-row parity between the in-row form and
  * the dataflow (shuffle + join) fallback it replaced, and the plan
  * property the r19 optimization claims — zero exchanges. */
class ArrayTfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("array_tf counts elements exactly, including delimiter-bearing ones") {
    assert(spark.catalog.functionExists("array_tf"), "extension not loaded")
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a b", "a", "b", "a b")), // "a b" must NOT conflate with a,b
      (2L, Seq.empty[String]),
      (3L, Seq("x", null, "x"))          // nulls skipped, not counted
    ).toDF("id", "arr")
    val m = df.select(col("id"), expr("array_tf(arr)").as("m"))
      .collect().map(r => r.getLong(0) -> r.getMap[String, Int](1)).toMap
    assert(m(1L) == Map("a b" -> 2, "a" -> 1, "b" -> 1))
    assert(m(2L) == Map.empty[String, Int])
    assert(m(3L) == Map("x" -> 2))
    // null array -> null map
    val n = df.select(expr("array_tf(CAST(NULL AS ARRAY<STRING>))").as("m"))
      .limit(1).collect()(0)
    assert(n.isNullAt(0))
  }

  test("in-row text_repetition matches the dataflow fallback row-for-row") {
    val inRow = SparkEntry.queries("text_repetition")(spark, dir)
    assert(inRow.queryExecution.executedPlan.toString.contains("array_tf"),
      "extension session did not plan the in-row form")
    // the fallback plan uses no extension functions, so it runs
    // unchanged in this session — same rows expected, incl. the NULL
    // bigram fractions of sub-2-token docs
    val fallback = graft.ops.TextOps.textRepetitionDataflow(
      spark.read.parquet(s"$dir/documents.parquet"))
    val a = inRow.collect().map(_.toSeq).toSet
    val b = fallback.collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("the in-row plan is one shuffle-free projection over the scan") {
    val df = SparkEntry.queries("text_repetition")(spark, dir)
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
