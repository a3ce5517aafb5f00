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
