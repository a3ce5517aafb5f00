package graft

import org.apache.spark.sql.DataFrame

/** DataSource V2 generator (`graft-docs`): determinism, partition
  * invariance, column pruning reaching the custom scan, partial limit
  * pushdown, and drop-in compatibility with the documents-family
  * operators.
  */
class DocGenSpec extends SparkSpec {

  private def gen(opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft-docs")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load()
  }

  test("same seed yields identical rows regardless of partitioning") {
    val a = gen("n" -> "500", "partitions" -> "1").collect().map(_.toSeq).toSet
    val b = gen("n" -> "500", "partitions" -> "7").collect().map(_.toSeq).toSet
    val c = gen("n" -> "500", "partitions" -> "32").collect().map(_.toSeq).toSet
    assert(a == b && b == c)
    assert(a.size == 500)
    val other = gen("n" -> "500", "seed" -> "7").collect().map(_.toSeq).toSet
    assert(other != a, "seed must change the corpus")
  }

  test("schema and content contracts hold") {
    val df = gen("n" -> "200", "minTokens" -> "10", "maxTokens" -> "20")
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSet == (0L until 200L).toSet)
    rows.foreach { r =>
      val tokens = r.getString(1).split(" ")
      assert(tokens.length >= 10 && tokens.length <= 20, r)
      assert(tokens.forall(_.startsWith("tok")), r)
      assert(r.getLong(4) == r.getString(1).length.toLong, r)
      assert(Set("en", "de", "fr", "es", "zh").contains(r.getString(2)))
      assert(Set("web", "books", "code", "wiki").contains(r.getString(3)))
    }
  }

  test("column pruning reaches the custom scan (text generation skipped)") {
    val df = gen("n" -> "100").select("doc_id", "lang")
    val plan = df.queryExecution.executedPlan.toString
    // the v2 scan's ReadSchema must carry only the requested columns
    assert(plan.contains("doc_id"), plan)
    assert(!plan.contains("ReadSchema: struct<doc_id:bigint,text"), plan)
    assert(df.count() == 100)
  }

  test("doc_id filters narrow the generated range (generator partition pruning)") {
    // 100M nominal ids, but the pushed range keeps only 500 — without
    // range narrowing this would generate 100M docs to return 500
    val df = gen("n" -> "100000000").filter("doc_id >= 1000 AND doc_id < 1500")
    val t0 = System.nanoTime()
    val rows = df.collect()
    val dt = (System.nanoTime() - t0) / 1e9
    assert(rows.length == 500)
    assert(rows.map(_.getLong(0)).toSet == (1000L until 1500L).toSet)
    assert(dt < 30, s"range not pushed: took $dt s")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ids=[1000,1500)"), plan)
  }

  test("lang filters skip text generation and match post-scan filtering") {
    val pushed = gen("n" -> "3000").filter("lang = 'en'")
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("langs=en"), plan)
    val viaScan = pushed.collect().map(_.toSeq).toSet
    // ground truth: filter applied AFTER an unfiltered scan
    val viaPost = gen("n" -> "3000").collect()
      .filter(_.getString(2) == "en").map(_.toSeq).toSet
    assert(viaScan == viaPost && viaScan.nonEmpty)
  }

  test("limit is pushed into each partition (partial push)") {
    val df = gen("n" -> "1000000", "partitions" -> "4").limit(5)
    // without pushdown this would generate 1M docs to return 5
    val t0 = System.nanoTime()
    assert(df.collect().length == 5)
    val dt = (System.nanoTime() - t0) / 1e9
    assert(dt < 30, s"limit not pushed: took $dt s")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("graft-docs"), scan)
  }

  test("dupEvery plants near-duplicates with ~6% token mutation") {
    val rows = gen("n" -> "200", "dupEvery" -> "10").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (i <- 9L until 200L by 10L) {
      val (dup, base) = (rows(i).split(" "), rows(i - 1).split(" "))
      assert(dup.length == base.length, s"doc $i must mirror its base's length")
      val diff = dup.zip(base).count { case (a, b) => a != b }
      assert(diff > 0 && diff <= dup.length / 16 + 1,
        s"doc $i: $diff of ${dup.length} tokens mutated")
    }
    // non-dup rows are untouched relative to the dupEvery=0 corpus
    val plain = gen("n" -> "200").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (i <- 0L until 200L if i % 10 != 9) assert(rows(i) == plain(i))
  }

  test("langMarkers make langid and the dup signal coexist") {
    val rows = gen("n" -> "300", "dupEvery" -> "10", "langMarkers" -> "true")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toList
    val markers = Set("the", "a", "of", "der", "die", "le", "la", "el", "los", "zh1", "zh2")
    rows.foreach { case (id, text, _) =>
      val found = text.split(" ").filter(markers).toSet
      assert(found.nonEmpty, s"no markers in doc $id")
      // markers are drawn from the BASE doc's language set (dup rows
      // inherit their base's language signal)
      val baseId = if (id % 10 == 9 && id > 0) id - 1 else id
      val expect = graft.sources.DocGen.markerWords(
        graft.sources.DocGen.lang(42L, baseId)).toSet
      assert(found.subsetOf(expect), s"doc $id markers $found vs $expect")
    }
    // dup twins still differ from their base (mutation off the marker grid)
    val byId = rows.map(r => r._1 -> r._2).toMap
    for (i <- 9L until 300L by 10L) assert(byId(i) != byId(i - 1), s"doc $i")
  }

  test("micro-batch stream replays the exact batch rows in rowsPerBatch slices") {
    val q = spark.readStream.format("graft-docs")
      .option("n", "2000").option("rowsPerBatch", "500").option("dupEvery", "10")
      .load()
      .writeStream.format("memory").queryName("docgen_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("docgen_stream").collect().map(_.toSeq).toSet
      val want = gen("n" -> "2000", "dupEvery" -> "10").collect().map(_.toSeq).toSet
      assert(got == want, "stream must replay exactly the batch rows")
      // 2000 ids admitted 500 per trigger: at least 4 non-empty batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4, q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("documents-family operators run unchanged on the generated corpus") {
    gen("n" -> "300").createOrReplaceTempView("gen_docs")
    val stats = spark.table("gen_docs")
      .withColumn("tk", org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("text"), " "))
      .selectExpr("doc_id", "size(tk) as n_tokens", "size(array_distinct(tk)) as n_distinct")
      .collect()
    assert(stats.length == 300)
    assert(stats.forall(r => r.getInt(1) >= r.getInt(2) && r.getInt(2) > 0))
  }

  test("COUNT(*) pushes down completely: closed-form count, no generation, no aggregate") {
    import org.apache.spark.sql.functions.col
    // 10 BILLION generated rows: countable only because the scan never
    // materializes one — the aggregate collapses to range arithmetic
    val big = spark.read.format("graft-docs").option("n", "10000000000").load()
    val t0 = System.nanoTime()
    val df = big.filter(col("doc_id") >= 2500000000L).agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    val n = df.head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 7500000000L)
    assert(secs < 30, s"pushed count took $secs s — did it generate rows?")
    // the final plan carries the pushed-count scan and NO aggregate exec
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("COUNT(*) pushed"), plan)
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
  }

  test("aggregate pushdown declines when it cannot be exact (lang filter, group-by)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.format("graft-docs").option("n", "500").load()
    // lang-filtered count: declined (lang is per-row) — runs as scan+agg
    val byLang = docs.filter(col("lang") === "en").count()
    val expected = docs.collect().count(_.getString(2) == "en")
    assert(byLang == expected)
    // grouped count: declined — values must match the full computation
    val grouped = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped.values.sum == 500L)
    val gPlan = docs.groupBy("lang").count().queryExecution.executedPlan.toString
    assert(!gPlan.contains("COUNT(*) pushed"), gPlan)
  }
}
