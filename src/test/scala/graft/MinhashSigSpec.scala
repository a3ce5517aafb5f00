package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** The native minhash_sig expression vs the built-in-HOF pipeline it
  * replaces: bit-parity on every permutation, null/edge semantics, and
  * the single-evaluation plan property the 16 sig[i] extracts rely on. */
class MinhashSigSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("native signature is bit-identical to the HOF form on the corpus") {
    assert(spark.catalog.functionExists("minhash_sig"), "extension not loaded")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val native = DedupOps.minhashSigFromText(docs)
    val hof = DedupOps.minhashSigHof(docs)
    assert(native.columns.sameElements(hof.columns))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("edge cases: null, empty string, repeated and empty tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the"),          // distinct collapses to one token
      (2L, ""),                     // split -> [""]: md5 of empty token
      (3L, "a  b"),                 // doubled space -> empty middle token
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val native = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("minhash_sig(text)").as("sig"))
    val hofBits = DedupOps.minhashSigHof(docs.filter(col("text").isNotNull))
    val n = native.select(col("doc_id") +:
      (0 until DedupOps.MinhashPerms).map(i => col("sig")(i).as(s"mh$i")): _*)
    assert(n.exceptAll(hofBits).isEmpty && hofBits.exceptAll(n).isEmpty)
    val nulls = docs.select(col("doc_id"), expr("minhash_sig(text)").as("sig"))
      .filter(col("sig").isNull).select("doc_id").collect().map(_.getLong(0))
    assert(nulls.sameElements(Array(4L)))
  }

  test("native shingle hashes are bit-identical to the HOF form, order included") {
    assert(spark.catalog.functionExists("shingle_hashes"))
    val native = spark.read.parquet(s"$dir/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), expr("shingle_hashes(text, 3)").as("ss"))
    val hof = DedupOps.shingleArraysHof(spark, dir)
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)

    import spark.implicits._
    val edge = Seq((1L, "a  b c d"), (2L, "x y z"), (3L, "p q"), (4L, "r r r r r"))
      .toDF("doc_id", "text")
    val nEdge = edge.filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), expr("shingle_hashes(text, 3)").as("ss"))
    val hEdge = edge.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(t)-3), i -> " +
          "cast(conv(substring(md5(concat_ws(' ', slice(t, i+1, 3))), 1, 13), 16, 10) as bigint)))")
        .as("ss"))
    assert(nEdge.exceptAll(hEdge).isEmpty && hEdge.exceptAll(nEdge).isEmpty)
    // doc 3 (< 3 tokens) filtered; doc 4's repeated shingle deduped
    val r4 = nEdge.filter(col("doc_id") === 4L)
      .select(size(col("ss"))).collect()(0).getInt(0)
    assert(r4 == 1)
  }

  test("native token_tf matches the HOF term-frequency idiom") {
    assert(spark.catalog.functionExists("token_tf"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val native = docs.select(col("doc_id"), explode(expr("token_tf(text)")))
      .select(col("doc_id"), col("key").as("tk"), col("value").as("tf"))
    val hof = docs.withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(array_distinct(tk), x -> struct(x AS tk, size(filter(tk, y -> y = x)) AS tf))"))
        .as("p"))
      .select(col("doc_id"), col("p.tk").as("tk"), col("p.tf").as("tf"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)

    import spark.implicits._
    val edge = Seq((1L, "a a  b"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val e = edge.select(col("doc_id"), explode(expr("token_tf(text)")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // "a a  b": a×2, empty token ×1 (doubled space), b×1; "" is one empty token
    assert(e == Set((1L, "a", 2), (1L, "", 1), (1L, "b", 1), (2L, "", 1), (3L, "x", 1)))
  }

  test("native winnowing fingerprints are bit-identical to the HOF form, order included") {
    assert(spark.catalog.functionExists("winnow_fps"), "extension not loaded")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val eligible = docs
      .filter(size(split(col("text"), " ")) >= DedupOps.WinnowK + DedupOps.WinnowW - 1)
    val native = eligible.select(col("doc_id"), expr("winnow_fps(text)").as("fps"))
    val hof = DedupOps.winnowFpArraysHof(docs)
    // array equality pins VALUES and first-occurrence ORDER both
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    assert(native.count() > 0)
    // short doc (< k + w - 1 tokens) yields the empty array
    import spark.implicits._
    val short = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(expr("winnow_fps(text)").as("fps")).collect()(0).getSeq[Long](0)
    assert(short.isEmpty)
    // a repeated-window doc dedupes its fingerprints (array_distinct
    // semantics): w+k-1 identical tokens -> every window min equal
    val rep = Seq((2L, Seq.fill(DedupOps.WinnowK + DedupOps.WinnowW)("z").mkString(" ")))
      .toDF("doc_id", "text")
    val repN = rep.select(expr("winnow_fps(text)").as("fps")).collect()(0).getSeq[Long](0)
    val repH = DedupOps.winnowFpArraysHof(rep).select("fps").collect()(0).getSeq[Long](0)
    assert(repN == repH && repN.length == 1)
  }

  test("byte-scanning expressions match HOF forms on multibyte unicode text") {
    // the corpus is ASCII-only, so this is the only coverage of the
    // UTF-8 premise all three native expressions rely on: 0x20 never
    // occurs inside a multibyte sequence (continuation bytes >= 0x80)
    import spark.implicits._
    val vocab = Vector("the", "Straße", "北京大学", "naïve", "🚀🌍", "résumé",
      "λόγος", "データ", "a", "", "x1", "мир")
    val rnd = new scala.util.Random(42)
    val docs = (1L to 200L).map { id =>
      val n = 3 + rnd.nextInt(12)
      (id, (1 to n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  "))
    }.toDF("doc_id", "text")

    val sigN = DedupOps.minhashSigFromText(docs)
    val sigH = DedupOps.minhashSigHof(docs)
    assert(sigN.exceptAll(sigH).isEmpty && sigH.exceptAll(sigN).isEmpty)

    val shN = docs.filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), expr("shingle_hashes(text, 3)").as("ss"))
    val shH = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(t)-3), i -> " +
          "cast(conv(substring(md5(concat_ws(' ', slice(t, i+1, 3))), 1, 13), 16, 10) as bigint)))")
        .as("ss"))
    assert(shN.exceptAll(shH).isEmpty && shH.exceptAll(shN).isEmpty)

    val tfN = docs.select(col("doc_id"), explode(expr("token_tf(text)")))
      .select(col("doc_id"), col("key"), col("value"))
    val tfH = docs.withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(array_distinct(tk), x -> struct(x AS key, size(filter(tk, y -> y = x)) AS value))"))
        .as("p"))
      .select(col("doc_id"), col("p.key").as("key"), col("p.value").as("value"))
    assert(tfN.exceptAll(tfH).isEmpty && tfH.exceptAll(tfN).isEmpty)

    val wnN = docs
      .filter(size(split(col("text"), " ")) >= DedupOps.WinnowK + DedupOps.WinnowW - 1)
      .select(col("doc_id"), expr("winnow_fps(text)").as("fps"))
    val wnH = DedupOps.winnowFpArraysHof(docs)
    assert(wnN.exceptAll(wnH).isEmpty && wnH.exceptAll(wnN).isEmpty)
  }

  test("the 16 column extracts evaluate the signature once, not 16 times") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = DedupOps.minhashSigFromText(docs)
      .queryExecution.optimizedPlan.toString
    val occurrences = "minhash_sig".r.findAllIn(plan).length
    assert(occurrences == 1,
      s"expected exactly one minhash_sig in the optimized plan, got $occurrences:\n$plan")
  }
}
