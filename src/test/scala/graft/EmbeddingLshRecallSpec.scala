package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Measured recall contract of the sign-bit embedding LSH family on
  * the planted-twin audit (`embedding_lsh_recall`): the bucketing must
  * co-locate genuine near-duplicates (the planted ±0.005 twins) while
  * ambient neighbor pairs land apart, and the Hamming-1 multiprobe
  * must dominate the exact 12-bit match it widens. The planted-twin
  * derivation is what makes this audit non-vacuous — the synthetic
  * embeddings' natural top-50 "similar" pairs sit at ambient cosine
  * (≈ 0.475 max) and bucket recall on them is noise (the rejected
  * round-7 prototype, NOTES_r7).
  */
class EmbeddingLshRecallSpec extends SparkSpec {

  private lazy val byMethod: Map[String, (Double, Double)] =
    DedupOps.embeddingLshRecall(spark, "/root/testdata/sf0.01")
      .groupBy("method")
      .agg(avg("hit_planted").as("rp"), avg("hit_ambient").as("ra"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

  test("planted twins are found; ambient pairs are not") {
    byMethod.foreach { case (m, (planted, ambient)) =>
      assert(planted >= 0.85, s"$m planted recall $planted")
      assert(ambient <= 0.10, s"$m ambient hit rate $ambient")
      assert(planted - ambient >= 0.75, s"$m separation")
    }
  }

  test("Hamming-1 multiprobe dominates the exact match on the same key") {
    assert(byMethod("sign12_probe1")._1 >= byMethod("sign12")._1)
    // and the narrower 8-bit key cannot lose MORE twins than 12 bits
    assert(byMethod("sign8")._1 >= byMethod("sign12")._1)
  }

  test("the planted twin really is a near-duplicate (cosine ≈ 1)") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("w", expr(
        "transform(v, (x, i) -> x + (CAST((vec_id*31 + i*7) % 11 AS DOUBLE) - 5.0)/1000.0)"))
    val minCos = e.select(
      (expr("aggregate(zip_with(v, w, (a, b) -> a * b), 0D, (acc, x) -> acc + x)") /
        (sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")) *
          sqrt(expr("aggregate(w, 0D, (acc, x) -> acc + x * x)")))).as("cos"))
      .agg(min("cos")).head.getDouble(0)
    assert(minCos >= 0.99, s"weakest planted twin cosine $minCos")
  }
}
