package graft

import org.apache.spark.sql.functions._

/** Native VecDot expression: registration via GraftExtensions, parity
  * with the higher-order-function fold, null/edge behavior. */
class VectorExpressionSpec extends SparkSpec {

  test("vec_dot is registered by GraftExtensions") {
    assert(spark.catalog.functionExists("vec_dot"))
  }

  test("vec_dot matches the aggregate/zip_with fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.7)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val out = df.select(
      expr("vec_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x*y), 0D, (acc, x) -> acc + x)").as("fold"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(out(0).getDouble(0) == 32.0)
    assert(out(2).getDouble(0) == 0.0)
  }

  test("vec_dot on real embeddings agrees with fold formulation") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
    val rows = e.select(
      expr("vec_dot(v, v)").as("native"),
      expr("aggregate(zip_with(v, v, (x, y) -> x*y), 0D, (acc, x) -> acc + x)").as("fold"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("simhash32 matches the dataflow majority-vote formulation") {
    import spark.implicits._
    // dataflow twin computed inline over the same docs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val native = docs.selectExpr("doc_id", "simhash32(array_distinct(split(text, ' '))) AS sh")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dataflow = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tk"))
      .withColumn("h", md5(col("tk")))
      .select(col("doc_id"), col("h"), explode(expr("sequence(1, 32)")).as("j"))
      .withColumn("vote",
        when(expr("(instr('0123456789abcdef', substring(h, j, 1)) - 1) % 2 = 1"), 1).otherwise(-1))
      .groupBy("doc_id", "j").agg(sum(col("vote")).as("v"))
      .withColumn("c", when(col("v") >= 0, "1").otherwise("0"))
      .groupBy("doc_id")
      .agg(expr("concat_ws('', transform(array_sort(collect_list(struct(j, c))), x -> x.c))").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native.size == 50 && native == dataflow)
    assert(native.values.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
  }

  test("optimizer rule rewrites self-dot folds into vec_dot") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
    val folded = e.select(
      expr("aggregate(zip_with(v, v, (x, y) -> x*y), 0D, (acc, x) -> acc + x)").as("norm2"))
    // the rule fires during optimization
    assert(folded.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      folded.queryExecution.optimizedPlan.toString)
    // and values equal the direct native form
    val direct = e.select(expr("vec_dot(v, v)").as("norm2"))
    val a = folded.collect().map(_.getDouble(0))
    val b = direct.collect().map(_.getDouble(0))
    assert(a.toSeq == b.toSeq)
  }

  test("rewrite does NOT fire for distinct arrays (zip_with padding semantics)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0, 5.0))).toDF("a", "b")
    val folded = df.select(
      expr("aggregate(zip_with(a, b, (x, y) -> x*y), 0D, (acc, x) -> acc + x)").as("d"))
    assert(!folded.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    // unequal lengths → null-padded product → null result, preserved
    assert(folded.collect()(0).isNullAt(0))
  }

  test("vec_dot propagates null elements like the fold") {
    import spark.implicits._
    val df = Seq((Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
    val native = df.select(expr("vec_dot(a, b)")).collect()(0)
    val fold = df.select(
      expr("aggregate(zip_with(a, b, (x, y) -> x*y), 0D, (acc, x) -> acc + x)")).collect()(0)
    assert(native.isNullAt(0) && fold.isNullAt(0))
  }

  test("vec_dot is null-safe") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(expr("vec_dot(a, b)")).collect()(0).isNullAt(0))
  }
}
