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
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "ann_bruteforce_topk", "ann_ivf_label",
    "text_quality", "text_fingerprint", "events_sessionize",
    "asof_join_signup", "asof_join_custom",
    "json_extract")

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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/parquet-footer costs land here, not in query 1
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // no cross-query cache effects in timings
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
