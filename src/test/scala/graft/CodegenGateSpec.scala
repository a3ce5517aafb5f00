package graft

/** Standing codegen-health gate (round-4 ask #2).
  *
  * Round 3 shipped a VecDot whose generated Java failed Janino
  * compilation and silently ran interpreted — correctness was unharmed
  * (the oracle checks the interpreted semantics) but the hot ANN path
  * lost exactly the codegen the expression exists to provide, and
  * nothing failed. This spec makes that failure mode LOUD:
  *
  *   - `spark.sql.codegen.fallback=false`  → a whole-stage compile
  *     failure throws instead of quietly re-planning without codegen;
  *   - `spark.sql.codegen.factoryMode=CODEGEN_ONLY` → expression-level
  *     codegen (projections, predicates outside WSCG) must compile too,
  *     no interpreted fallback anywhere.
  *
  * Runs every Bench.headline query plus the vector-expression queries
  * at sf0.001 under those confs, so any future custom Expression or
  * oversized generated method fails this suite instead of shipping as
  * a silent slowdown. Uses a newSession() so the strict confs cannot
  * leak into the other suites sharing the SparkContext.
  */
class CodegenGateSpec extends SparkSpec {

  private lazy val strict = {
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.fallback", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s
  }

  private val sfDir = "/root/testdata/sf0.001"

  // The bench guard set + every query touching the native vector
  // expressions (vec_dot via ANN / embedding dedup, simhash32).
  private val gated: Seq[String] =
    (Bench.headline ++ Seq(
      "dedup_embedding_cosine", "dedup_embedding_lsh",
      "dedup_embedding_lsh_multiprobe", "embedding_stats",
      "embedding_centroids", "ann_ivf_multiprobe",
      "embedding_quantize_int8", "ann_quantized_topk",
      // round-8 continuation: the CMS screen (native CmsEstimate
      // codegen), the CDC family, and the Morton-key bit arithmetic
      "text_heavy_hitters_cms", "cdc_merge_upsert",
      "cdc_changelog_compact", "cdc_changelog_compact_salted",
      "cdc_scd2_intervals", "layout_zorder_key",
      // round 9: the two queries RETIRED from the bench headline keep
      // their codegen coverage here, plus the round-9 additions (the
      // composed MRL probes' literal-codebook folds, the change feed's
      // null-safe comparison chain, the quantile screen)
      "dedup_ngram_jaccard", "ann_bruteforce_topk", "ann_mrl_topk",
      "ann_mrl_ivfpq_topk", "cdc_table_diff",
      // round 12: the persisted-index serve path (model reload +
      // rendered literal folds + bucket-pruned ADC) and its day-2
      // grown twin under CODEGEN_ONLY; the snapshot log's bloom-index
      // lifecycle (BloomFilterAggregate build + native BloomHit prune)
      "ann_index_probe", "ann_index_filtered_probe", "ann_index_grow_probe",
      "snap_bloom_lookup",
      "snap_delete_in", "dedup_decontaminate_semantic",
      "quantile_select_exact", "quantile_select_plateau",
      "quantile_select_by_lang",
      "corpus_mix_temperature", "bpe_merges", "bpe_segment",
      // round 14: the large-K broadcast-model assignment (the fold over
      // a model COLUMN must codegen like the literal fold it replaces),
      // and the flat-PQ probe retired from the bench headline (round-9
      // precedent: retired queries keep their codegen coverage here)
      "ann_ivf_broadcast_assign", "ann_pq_rerank",
      // round 15: the merge-on-read delete gate — its read-back takes
      // the small-mask fast path, so the native DvMaskHit filter must
      // compile under CODEGEN_ONLY (the masked scan exists to stay one
      // codegen'd pipeline; a Janino failure here would silently hand
      // the 3× win back)
      "snap_delete_mor")).distinct
      .filter(SparkEntry.queries.contains)

  test("every gated query executes with codegen fallback disabled") {
    val failures = gated.flatMap { name =>
      try { SparkEntry.queries(name)(strict, sfDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("vector and headline plans contain whole-stage codegen stages") {
    // presence, not just absence-of-failure: a plan that quietly lost
    // all its WholeStageCodegen spans would pass the strict run (there
    // is nothing to compile) while running interpreted
    val mustHaveWscg = Seq(
      "q1_agg", "window_rank", "reconcile_pending",
      "ann_bruteforce_topk", "ann_ivf_centroid", "dedup_embedding_cosine")
    mustHaveWscg.foreach { name =>
      val df = SparkEntry.queries(name)(strict, sfDir)
      df.collect() // materialize THIS df's plan so AQE's FINAL plan (with codegen stages) exists
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // formatted explain marks whole-stage-codegen membership as
      // "[codegen id : N]" on each operator inside a WSCG span
      assert(s.contains("codegen id"), s"$name: no WholeStageCodegen stage in\n$s")
    }
  }

  test("vec_dot compiles under CODEGEN_ONLY for nullable and non-null element arrays") {
    import org.apache.spark.sql.functions._
    import strict.implicits._
    // non-nullable elements (literal arrays): nullable=false path —
    // the exact shape whose `isNull = true` assignment Janino rejected
    val lit = strict.range(1000).select(
      expr("array(cast(id as double), 2.0d)").as("a"),
      expr("array(3.0d, cast(id as double))").as("b"))
    val s1 = lit.select(expr("vec_dot(a, b)").as("d")).agg(sum("d")).collect()
    assert(!s1(0).isNullAt(0))
    // nullable elements (parquet arrays): null-element propagation path
    val emb = strict.read.parquet(s"$sfDir/embeddings.parquet")
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
    val s2 = emb.select(expr("vec_dot(v, v)").as("n2")).agg(count("n2")).collect()
    assert(s2(0).getLong(0) > 0)
  }
}
