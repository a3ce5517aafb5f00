package graft

import org.apache.spark.sql.functions._

/** Mathematical invariants of the int8 quantization family — the
  * oracle gate proves cross-engine PARITY; these prove the numbers
  * mean what they claim. */
class QuantizationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("reconstruction error is bounded by half a quantization step") {
    // q = clamp(floor(x/scale + 1/2)) ⇒ |q·scale − x| ≤ scale/2 for
    // unclamped elements; clamping can only occur at |x| = max|x|,
    // where q = ±127 is exact up to the same bound. Allow the round-6
    // rendering slack on both sides of the comparison.
    val rows = SparkEntry.queries("embedding_quantize_int8")(spark, dir)
      .select(col("scale6"), col("max_abs_err6")).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (scale, err) = (r.getDouble(0), r.getDouble(1))
      assert(err <= scale / 2 + 1e-6, s"err $err > scale/2 ${scale / 2}")
    }
  }

  test("quantized top-k search recalls most float-exact neighbors") {
    def topk(q: String): Map[Long, Set[Long]] =
      SparkEntry.queries(q)(spark, dir).select("qid", "nid").collect()
        .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val exact = topk("ann_bruteforce_topk")
    val quant = topk("ann_quantized_topk")
    assert(exact.keySet == quant.keySet)
    val recalls = exact.map { case (q, e) => (e & quant(q)).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    // 8-bit symmetric quantization on 64-dim vectors preserves ordering
    // well; a broken quantizer (wrong scale, wrong rounding) collapses
    // this toward chance (~5/499)
    assert(mean >= 0.6, s"mean recall@5 $mean too low: $recalls")
  }

  test("MRL truncation to 16 dims recalls above chance (the un-finetuned baseline)") {
    def topk(q: String): Map[Long, Set[Long]] =
      SparkEntry.queries(q)(spark, dir).select("qid", "nid").collect()
        .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val exact = topk("ann_bruteforce_topk")
    val mrl = topk("ann_mrl_topk")
    assert(exact.keySet == mrl.keySet)
    val recalls = exact.map { case (q, e) => (e & mrl(q)).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    val chance = 5.0 / 499
    // a prefix of an UNTRAINED embedding keeps 1/4 of the information —
    // recall must sit clearly above chance but (on this corpus) below
    // int8's 0.6, which spends 8× the bits per retained dimension; a
    // broken slice/renormalization collapses to chance
    assert(mean > 5 * chance, s"mean recall@5 $mean vs chance $chance")
    info(f"MRL-16 mean recall@5 = $mean%.3f (chance $chance%.4f)")
  }

  test("the compression triad at equal protocol: truncate-then-PQ serves above chance") {
    // bits-vs-recall, the three compression axes side by side at the
    // shared 50-query / shortlist-20 / exact-rerank-top-3 protocol:
    //   int8 (scalar):   512 bits/vec — recall floor 0.6 (test above, @5)
    //   PQ-64 (product): 32 bits/vec  — rerank floor 0.5 (PqSpec, @3)
    //   MRL-16×PQ (dim): 16 bits/vec  — this test, the cheapest index
    // The MRL-PQ shortlist quantizes a quarter of the dimensions with
    // half PQ-64's code budget, so its recall must sit below PQ-64's
    // but far above chance — collapse to chance means the truncation
    // or the 4-subspace codebooks broke
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val q = e.filter(col("vec_id") < graft.ops.SimilarityOps.PqQueryCount)
    val exactScored = q.as("q").join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"),
        expr("aggregate(zip_with(q.v, c.v, (x, y) -> x*y), 0D, (acc, x) -> acc + x)").as("dp"))
    val w = Window.partitionBy("qid").orderBy(col("dp").desc, col("nid"))
    val exact = exactScored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= graft.ops.SimilarityOps.PqTopK)
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val mrlPq = SparkEntry.queries("ann_mrl_pq_topk")(spark, dir)
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(exact.keySet == mrlPq.keySet)
    val recalls = exact.map { case (k, t) => (t & mrlPq(k)).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    val chance = 3.0 / 499
    info(f"MRL-16xPQ-4 rerank mean recall@3 = $mean%.3f (chance $chance%.4f)")
    assert(mean > 10 * chance, f"mean recall@3 $mean%.3f collapsed toward chance")
  }
}
