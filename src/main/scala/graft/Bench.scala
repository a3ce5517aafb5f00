package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall-clock seconds.
  *
  * Headline set: a fixed, stable subset covering every operator family
  * (scan/agg, multiway join, window, set op, reconcile, dedup exact +
  * LSH + Jaccard, ANN, text, events). Kept stable across rounds so the
  * BASELINE.md 2× envelope stays comparable.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q1_agg", "q3_topk", "q5_region_revenue", "window_rank",
    "agg_distinct", "set_except", "reconcile_pending",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped", "dedup_simhash",
    "ann_bruteforce_topk", "ann_ivf_label", "ann_ivf_centroid",
    "text_quality", "text_fingerprint", "events_sessionize",
    "asof_join_signup", "asof_join_custom",
    "json_extract",
    // round 4: the iterative connected-components loop (the only
    // nontrivial execution pattern previously without 2x-gate coverage)
    // and the capstone curation pipeline (the closest thing to a real
    // user workload)
    "dedup_cluster_reps", "corpus_curation",
    // round 4 (late): the retrieval pair — the vocabulary-join TF-IDF
    // ranking and the broadcast-stats BM25 scorer — plus the broadcast
    // heldout decontamination screen and the double-vocabulary-join LM
    // quality filter
    "text_tfidf_top_terms", "bm25_topk",
    "dedup_decontaminate", "text_bigram_logprob",
    // round 5: the Gopher-family repetition signals (in-row token
    // stats + per-doc bigram heavy hitter), winnowing fingerprint
    // dedup (native rolling-hash + window-minima expression), and the
    // two training-prep ops (in-row chunking, per-shard bin packing)
    "text_repetition", "dedup_winnow", "doc_chunking", "corpus_pack_bins",
    // round 5 (late): the clustering/selection family — iterative
    // Lloyd's with the shuffle-free literal-centroid assignment,
    // SemDeDup within-cluster drops, corpus-wide segment dedup, and
    // DSIR importance top-k
    "embedding_kmeans", "dedup_semantic", "dedup_paragraph",
    "corpus_importance_dsir", "text_perplexity_bucket",
    "corpus_mix_rebalance", "ann_ivf_kmeans", "corpus_sample_weighted",
    "dedup_paragraph_rebuild")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_bench_wh_").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/parquet-footer costs land here, not in query 1
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // Each query runs `reps` times and reports the MEDIAN: a single
    // sample cannot distinguish host contention from a plan regression
    // (round-1 driver bench showed uniform 2.5-4.6x inflation from
    // contention alone), so n=1 made the 2x baseline gate meaningless.
    // The RAW samples are emitted too — a median alone cannot
    // distinguish "3 contended samples" from a plan regression (that
    // ambiguity cost round 2 a false 26.7 s minhash reading); with the
    // arrays in the artifact, a contaminated window is diagnosable
    // without a rerun.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2 // midpoint for even n
    }
    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // no cross-query cache effects in timings
        dt
      }
      name -> samples
    }
    // the reference's largest real workload, end-to-end: 100k-row gzip
    // CSV bulk ingest + the migrations_seq sequence (2× ADD COLUMN, 3×
    // dependent UPDATE) + the 7 verification counts
    // (reference: tests/test_clickhouse_migration.py:91-118)
    val migrateSamples = (1 to reps).flatMap { _ =>
      try Some(timeMigrateSeq(spark))
      catch { case e: Throwable =>
        System.err.println(s"[bench] migrate_seq_100k: $e"); None }
    }
    // the persisted-index retrieval topology — the actual 100 TB shape
    // for the scoring family: the vocabulary index is a batch job built
    // once and amortized over every scoring run, so the index build sits
    // OUTSIDE the timed section and each sample times one BM25 + one
    // TF-IDF scoring pass probing the bucketed index (exchange-free on
    // the vocab side, BucketingSpec)
    val retrievalSamples = (try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_bench_retr")
      graft.ops.TextOps.writeVocabIndex(docs, "graft_bench_retr.vocab")
      val nDocs = docs.count()
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.TextOps.bm25AgainstVocab(spark, docs,
          "graft_bench_retr.vocab", nDocs).count()
        graft.ops.TextOps.tfidfAgainstVocab(spark, docs,
          "graft_bench_retr.vocab", nDocs).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] retrieval_index_probe: $e"); Seq.empty[Double]
    })
    val all = results ++
      (if (migrateSamples.nonEmpty) Seq("migrate_seq_100k" -> migrateSamples) else Nil) ++
      (if (retrievalSamples.nonEmpty) Seq("retrieval_index_probe" -> retrievalSamples) else Nil)
    def fm(v: Double) = f"$v%.3f"
    val qs = all.map { case (k, v) => "\"" + k + "\":" + fm(median(v)) }
      .mkString("{", ",", "}")
    val raw = all.map { case (k, v) => "\"" + k + "\":" + v.map(fm).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = all.map { case (_, v) => median(v) }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"samples":$raw,"sf":"$sfDir"}""")
    spark.stop()
  }

  private def timeMigrateSeq(spark: SparkSession): Double = {
    import java.nio.file.{Files, Paths}
    // a failed prior rep leaves the database behind — clear it so one
    // bad sample doesn't poison the remaining reps
    spark.sql("DROP DATABASE IF EXISTS graft_bench CASCADE")
    val scratch = Files.createTempDirectory("graft_bench_migrate_").toString
    val home = s"$scratch/migrations"
    Files.createDirectories(Paths.get(home))
    Files.writeString(Paths.get(s"$home/V1__create.sql"),
      "CREATE TABLE graft_bench.sample(id UInt32, name UInt32) ENGINE MergeTree PARTITION BY tuple() ORDER BY tuple()")
    val t0 = System.nanoTime()
    graft.migrator.Migrator.migrate(spark, "graft_bench", home, s"$scratch/ledger")
    spark.read.option("header", "true").schema("id INT, name INT")
      .csv("/root/reference/tests/migrations_seq/test.csv.gz")
      .write.mode("append").insertInto("graft_bench.sample")
    Files.writeString(Paths.get(s"$home/V2_seq_dmls.json"),
      """["ALTER TABLE graft_bench.sample ADD COLUMN enabled UInt32 DEFAULT 1",
        |"ALTER TABLE graft_bench.sample ADD COLUMN guard UInt32 DEFAULT -1",
        |"ALTER TABLE graft_bench.sample UPDATE enabled=0 WHERE name > 3000",
        |"ALTER TABLE graft_bench.sample UPDATE guard=0 WHERE enabled = 0",
        |"ALTER TABLE graft_bench.sample UPDATE guard=1 WHERE enabled = 1"]""".stripMargin)
    graft.migrator.Migrator.migrate(spark, "graft_bench", home, s"$scratch/ledger")
    val r = spark.sql(
      """SELECT count(*), count(CASE WHEN name > 3000 THEN 1 END),
         count(CASE WHEN enabled = 0 THEN 1 END), count(CASE WHEN guard = 0 THEN 1 END),
         count(CASE WHEN guard = 1 THEN 1 END), count(CASE WHEN guard = -1 THEN 1 END)
         FROM graft_bench.sample""").collect()(0)
    require(r.getLong(0) == 100000L && r.getLong(1) == r.getLong(2)
      && r.getLong(2) == r.getLong(3) && r.getLong(4) == r.getLong(0) - r.getLong(3)
      && r.getLong(5) == 0L, s"consistency check failed: $r")
    val dt = (System.nanoTime() - t0) / 1e9
    spark.sql("DROP DATABASE graft_bench CASCADE")
    dt
  }
}
