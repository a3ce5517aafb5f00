package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import ops.SimilarityOps

/** Measured contracts of the product-quantization ANN family
  * (`embedding_pq_codes` / `ann_pq_topk`): codes are structurally
  * valid, compression is the claimed 32×, the ADC ranking recalls far
  * more of the exact dot-product top-k than chance, and the ADC score
  * approximates the true dot product (it IS the dot product against
  * the reconstruction, so its error is bounded by the quantizer's).
  */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val codes = SparkEntry.queries("embedding_pq_codes")(spark, dir).collect()
  private lazy val pqTopk = SparkEntry.queries("ann_pq_topk")(spark, dir).collect()

  test("every vector encodes to PqM in-range codes; codes are diverse") {
    assert(codes.length == 500)
    val parsed = codes.map(r => (r.getLong(0), r.getString(1).split(",").map(_.toInt)))
    parsed.foreach { case (id, cs) =>
      assert(cs.length == SimilarityOps.PqM, s"vec $id has ${cs.length} codes")
      assert(cs.forall(c => c >= 0 && c < SimilarityOps.PqK), s"vec $id codes out of range")
    }
    // a broken quantizer (collapsed codebook) maps everything to one
    // codeword; a healthy one uses most of the 16 codes in each subspace
    (0 until SimilarityOps.PqM).foreach { m =>
      val used = parsed.map(_._2(m)).distinct.length
      assert(used >= SimilarityOps.PqK / 2, s"subspace $m uses only $used codes")
    }
  }

  test("the stored index is 32x smaller than the float vectors") {
    // 64 dims × 4-byte float = 256 bytes vs PqM one-byte codes
    val vectorBytes = 64 * 4
    val codeBytes = SimilarityOps.PqM * 1
    assert(vectorBytes / codeBytes == 32)
  }

  test("ADC top-3 recalls the exact dot-product top-3 well above chance") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val q = e.filter(col("vec_id") < SimilarityOps.PqQueryCount)
    val exactScored = q.as("q").join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"),
        expr("aggregate(zip_with(q.v, c.v, (x, y) -> x*y), 0D, (acc, x) -> acc + x)").as("dp"))
    val w = Window.partitionBy("qid").orderBy(col("dp").desc, col("nid"))
    val exact = exactScored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SimilarityOps.PqTopK)
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val pq = pqTopk.groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(exact.keySet == pq.keySet)
    val recalls = exact.map { case (k, t) => (t & pq(k)).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    val chance = SimilarityOps.PqTopK.toDouble / 499
    assert(mean > 10 * chance, s"mean recall@3 $mean vs chance $chance")
    info(f"PQ ADC mean recall@3 = $mean%.3f (chance ${chance}%.4f)")
    // Empirical floor on this corpus: ≈0.19 measured (31× chance). The
    // ambient-similar fixture makes rank-3 margins smaller than the
    // 64-bit codes' quantization noise — the same corpus effect that
    // gives int8 (512 bits/vector) only 0.6 — so the HONEST per-bits
    // reading is: 16× fewer bits, 3× less recall, and the production
    // answer is the rerank stage (next test), not more ADC bits. The
    // floor guards collapse (a broken codebook or misindexed LUT reads
    // ≈ chance = 0.006).
    assert(mean >= 0.12, f"mean recall@3 $mean%.3f below pinned floor 0.12")
  }

  test("ADC shortlist + exact rerank recovers most of the exact top-3") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val q = e.filter(col("vec_id") < SimilarityOps.PqQueryCount)
    val exactScored = q.as("q").join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"),
        expr("aggregate(zip_with(q.v, c.v, (x, y) -> x*y), 0D, (acc, x) -> acc + x)").as("dp"))
    val w = Window.partitionBy("qid").orderBy(col("dp").desc, col("nid"))
    val exact = exactScored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SimilarityOps.PqTopK)
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val rer = SparkEntry.queries("ann_pq_rerank")(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(exact.keySet == rer.keySet)
    val recalls = exact.map { case (k, t) => (t & rer(k)).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    info(f"PQ rerank mean recall@3 = $mean%.3f")
    // rerank quality is bounded only by shortlist (ADC top-20) recall;
    // reading 20 raw vectors per query instead of 499 must recover the
    // large majority of the exact top-3
    assert(mean >= 0.5, f"rerank mean recall@3 $mean%.3f below floor 0.5")
  }

  test("the composed IVF-PQ probe returns results from the query's own cell only") {
    val rows = SparkEntry.queries("ann_ivfpq_topk")(spark, dir).collect()
    assert(rows.nonEmpty)
    // every (qid, nid) pair must share the reported bucket — recompute
    // assignments through the public kmeans entry and cross-check
    val cells = SparkEntry.queries("embedding_kmeans")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (qid, nid, bucket) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(cells(qid) == bucket, s"query $qid reported cell $bucket, assigned ${cells(qid)}")
      assert(cells(nid) == bucket, s"neighbor $nid of $qid outside cell $bucket")
    }
    // and the composed probe's hits agree with the cell-restricted
    // exact truth far above chance — i.e. the within-cell ADC+rerank
    // pipeline is doing its job, not returning arbitrary cell members
    val ivfExact = SparkEntry.queries("ann_ivf_kmeans")(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val composed = rows.groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val common = ivfExact.keySet & composed.keySet
    assert(common.nonEmpty)
    // note: ann_ivf_kmeans ranks by cosine, the PQ family by dot — the
    // two orders differ legitimately where norms vary, so this is an
    // overlap sanity floor, not an equality
    val overlap = common.toSeq.map(k => (ivfExact(k) & composed(k)).size.toDouble /
      math.max(1, ivfExact(k).size))
    val mean = overlap.sum / overlap.size
    info(f"IVF-PQ vs within-cell cosine-exact overlap@3 = $mean%.3f")
    assert(mean >= 0.2, f"overlap $mean%.3f — composed probe disagrees wildly with cell truth")
  }

  test("the MRL triple composition stays cell-contained and tracks the cell truth") {
    // the cheapest index in the family (16-bit truncated-prefix codes
    // inside full-width cells) must keep BOTH composition invariants:
    // results come only from the query's own coarse cell, and the
    // within-cell shortlist+rerank agrees with the cell-restricted
    // exact ranking far above chance (the rerank is full-width exact,
    // so only shortlist misses can lower the overlap)
    val rows = SparkEntry.queries("ann_mrl_ivfpq_topk")(spark, dir).collect()
    assert(rows.nonEmpty)
    val cells = SparkEntry.queries("embedding_kmeans")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (qid, nid, bucket) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(cells(qid) == bucket, s"query $qid reported cell $bucket, assigned ${cells(qid)}")
      assert(cells(nid) == bucket, s"neighbor $nid of $qid outside cell $bucket")
    }
    val ivfExact = SparkEntry.queries("ann_ivf_kmeans")(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val composed = rows.groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val common = ivfExact.keySet & composed.keySet
    assert(common.nonEmpty)
    val overlap = common.toSeq.map(k => (ivfExact(k) & composed(k)).size.toDouble /
      math.max(1, ivfExact(k).size))
    val mean = overlap.sum / overlap.size
    info(f"MRL-IVF-PQ vs within-cell cosine-exact overlap@3 = $mean%.3f")
    // floor below the 64-bit composition's 0.2: the 16-bit prefix codes
    // blur the shortlist more, but collapse to ~0 means a broken chain
    assert(mean >= 0.1, f"overlap $mean%.3f — triple composition disagrees wildly with cell truth")
  }

  test("ADC score equals the dot product against the PQ reconstruction") {
    // ADC(q, x) = Σ_m <q_m, c_{m,code_m(x)}> = <q, reconstruct(x)> — so
    // |ADC − trueDot| is exactly |<q, x − reconstruct(x)>|, the
    // quantization error's projection. Sanity: ADC within an order of
    // magnitude of the true dot for the top hits (not a misindexed LUT,
    // which produces uncorrelated scores).
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val byId = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val errs = pqTopk.map { r =>
      val (qid, nid, adc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val trueDot = byId(qid).zip(byId(nid)).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
      math.abs(adc - trueDot)
    }
    val meanErr = errs.sum / errs.length
    val meanAdc = pqTopk.map(_.getDouble(2)).sum / pqTopk.length
    assert(meanErr < math.abs(meanAdc),
      s"mean |ADC − dot| $meanErr vs mean ADC $meanAdc — scores uncorrelated")
  }
}
