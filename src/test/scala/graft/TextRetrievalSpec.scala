package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Tables, TextOps}

/** Semantic invariants of the retrieval/sampling family — the oracle
  * gate proves cross-engine parity; these prove the rankings and quotas
  * mean what they claim. */
class TextRetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tfidf keeps at most top-k terms per doc, each occurring in the doc") {
    val out = SparkEntry.queries("text_tfidf_top_terms")(spark, dir)
      .select("doc_id", "tk", "tf", "tfidf6").collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= TextOps.TfIdfTopK))
    assert(byDoc.size == 500)
    val texts = Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    out.foreach { r =>
      assert(texts(r.getLong(0)).contains(r.getString(1)),
        s"term ${r.getString(1)} not in doc ${r.getLong(0)}")
      assert(r.getDouble(3) >= 0)
    }
  }

  test("tfidf ranks a repeated rare term above a common one") {
    // Within any one document, tf*ln(N/df) must prefer (tf=1, rare df)
    // over (tf=1, df=N) — a token shared by every document scores 0.
    val scored = SparkEntry.queries("text_tfidf_top_terms")(spark, dir)
    val worst = scored.groupBy("doc_id").agg(min("tfidf6").as("m"))
      .agg(min("m")).collect()(0).getDouble(0)
    assert(worst > 0, "a zero-information term survived into some doc's top-k")
  }

  test("bm25 returns only docs containing a query term, ranked descending") {
    val rows = SparkEntry.queries("bm25_topk")(spark, dir).collect()
    assert(rows.length == TextOps.Bm25TopK)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val texts = Tables.t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    rows.foreach { r =>
      val tks = texts(r.getLong(0))
      assert(TextOps.Bm25Terms.exists(tks.contains),
        s"doc ${r.getLong(0)} scored ${r.getDouble(1)} with no query term")
    }
  }

  test("decontaminate flags only train docs that literally share an 8-gram with heldout") {
    def grams(text: String): Set[String] = {
      val tk = text.split(" ")
      if (tk.length < 8) Set.empty
      else tk.sliding(8).map(_.mkString(" ")).toSet
    }
    val docs = Tables.t(spark, dir, "documents")
      .withColumn("bucket", pmod(
        expr("cast(conv(substring(md5(text), 1, 13), 16, 10) as bigint)"), lit(100L)))
      .select("doc_id", "bucket", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val heldGrams = docs.filter(_._2 >= TextOps.HeldoutBucket)
      .flatMap(d => grams(d._3)).toSet
    val expected = docs.filter(_._2 < TextOps.HeldoutBucket)
      .filter(d => grams(d._3).exists(heldGrams.contains)).map(_._1).toSet
    val flagged = SparkEntry.queries("dedup_decontaminate")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == expected,
      s"extra: ${(flagged -- expected).take(5)}, missed: ${(expected -- flagged).take(5)}")
    assert(flagged.nonEmpty, "fixture produced no contamination — test is vacuous")
  }

  test("top pmi pair occurs adjacently at least PmiMinCount times") {
    val rows = SparkEntry.queries("text_bigram_pmi")(spark, dir).collect()
    assert(rows.length == TextOps.PmiTopK)
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val (w1, w2, nAb) = (rows.head.getString(0), rows.head.getString(1), rows.head.getLong(2))
    val adj = Tables.t(spark, dir, "documents").select("text").collect()
      .map(_.getString(0).split(" ").sliding(2)
        .count(p => p.length == 2 && p(0) == w1 && p(1) == w2)).sum
    assert(adj == nAb && adj >= TextOps.PmiMinCount, s"($w1,$w2): adj=$adj n_ab=$nAb")
  }

  test("bigram logprob is nonpositive and covers every bigram instance") {
    val rows = SparkEntry.queries("text_bigram_logprob")(spark, dir)
      .select("doc_id", "n_bigrams", "avg_logprob6").collect()
    assert(rows.length == 500)
    val nTokens = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == nTokens(r.getLong(0)) - 1,
        s"doc ${r.getLong(0)}: ${r.getLong(1)} bigrams from ${nTokens(r.getLong(0))} tokens")
      // every p(w2|w1) <= 1, so the average log cannot be positive
      assert(r.getDouble(2) <= 0.0)
    }
  }

  test("stratified sample meets the exact per-language quota and matches the single-window form") {
    val out = SparkEntry.queries("corpus_sample_stratified")(spark, dir)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langSizes = Tables.t(spark, dir, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    langSizes.foreach { case (lang, n) =>
      assert(counts(lang) == math.min(n, TextOps.StratQuota.toLong),
        s"$lang: got ${counts.get(lang)} of $n docs")
    }
    // the salted two-stage result is exactly the single global window's
    val single = Tables.t(spark, dir, "documents")
      .withColumn("h52",
        expr("cast(conv(substring(md5(text), 1, 13), 16, 10) as bigint)"))
      .withColumn("rk", row_number()
        .over(Window.partitionBy("lang").orderBy(col("h52"), col("doc_id"))).cast("long"))
      .filter(col("rk") <= TextOps.StratQuota)
      .select("lang", "doc_id", "h52", "rk")
    assert(out.exceptAll(single).isEmpty && single.exceptAll(out).isEmpty)
  }

  test("two-stage stratified sampling equals the single window on adversarial random data") {
    // heavy skew (90% one stratum), duplicate texts (h52 ties resolved
    // by doc_id), strata smaller than the quota, and ids far sparser
    // than the salt modulus — 5 seeded trials
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 400).map { i =>
        val lang = if (rnd.nextDouble() < 0.9) "big"
          else Seq("s1", "s2", "tiny")(rnd.nextInt(3))
        val text = s"doc ${rnd.nextInt(120)} body" // ~3.3x duplicate rate
        (rnd.nextLong().abs, text, lang)
      }
      val df = rows.toDF("doc_id", "text", "lang").repartition(13)
      val quota = 7
      val out = graft.ops.TextOps.stratifiedSample(df, quota)
      val single = df.withColumn("h52",
          expr("cast(conv(substring(md5(text), 1, 13), 16, 10) as bigint)"))
        .withColumn("rk", row_number().over(Window.partitionBy("lang")
          .orderBy(col("h52"), col("doc_id"))).cast("long"))
        .filter(col("rk") <= quota)
        .select("lang", "doc_id", "h52", "rk")
      assert(out.exceptAll(single).isEmpty && single.exceptAll(out).isEmpty,
        s"seed $seed diverged")
    }
  }
}
