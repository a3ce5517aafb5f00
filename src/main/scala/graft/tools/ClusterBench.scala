package graft.tools

import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Multi-process scaling bench: the same catalog queries, timed under a
  * REAL multi-JVM Spark standalone cluster instead of local[N].
  *
  * Why this exists: every other measurement in SCALING.md runs
  * local[32], where "shuffle" is an in-process memory copy and
  * "broadcast" is a shared reference — the serialization, network
  * (loopback socket), and executor-scheduling terms that dominate
  * cluster overheads are structurally invisible. This tool points the
  * SAME queries at a standalone master (workers in separate JVMs on
  * this host), so every shuffle pays real serde + socket transfer and every
  * broadcast pays a real torrent distribution — the closest a single
  * host gets to the 1000-executor wire picture.
  *
  * Master selection via SPARK_GRAFT_MASTER (default local[32]); when a
  * spark:// master is used, SPARK_GRAFT_JAR must point at the packaged
  * graft jar so executor JVMs can load the catalog's lambdas and native
  * expressions. Executor sizing via SPARK_GRAFT_EXEC_CORES /
  * SPARK_GRAFT_EXEC_MEM (defaults 8 / 12g).
  *
  * Usage: ClusterBench <sfDir> [reps] [only=a,b,c]
  * Output: one JSON line, pass-interleaved per-query medians (same
  * discipline as graft.Bench).
  */
object ClusterBench {

  /** Shuffle/join/iteration-heavy subset — the queries whose cluster
    * cost model differs most from local[N]: wide aggs, multiway
    * broadcast chains, semi/anti fact self-joins, banded dedup with its
    * index shuffles, iterative CC and k-means (per-round scheduling +
    * broadcast), retrieval's vocabulary joins, and the curation
    * one-shuffle verdict pipeline. */
  val subjects: Seq[String] = Seq(
    "q1_agg", "q3_topk", "q5_region_revenue", "q21_waiting_supplier",
    "window_rank", "dedup_exact", "dedup_minhash_lsh",
    "dedup_cluster_reps", "dedup_substring", "text_tfidf_top_terms",
    "bm25_topk", "corpus_curation", "embedding_kmeans", "ann_ivf_kmeans",
    "events_sessionize", "text_repetition")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ClusterBench <sfDir> [reps] [only=a,b,c]")
    val dir = args(0)
    val reps = args.lift(1).filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val only = args.find(_.startsWith("only="))
      .map(_.stripPrefix("only=").split(",").toSet)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")

    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_cluster_wh_").toString)
      .config("spark.ui.enabled", "false")
    val forCluster = master.startsWith("spark://")
    val b2 =
      if (!forCluster) b
      else {
        val jar = sys.env.getOrElse("SPARK_GRAFT_JAR",
          sys.error("SPARK_GRAFT_JAR required for a spark:// master"))
        b.config("spark.jars", jar)
          .config("spark.driver.host", "127.0.0.1")
          .config("spark.executor.cores", sys.env.getOrElse("SPARK_GRAFT_EXEC_CORES", "8"))
          .config("spark.executor.memory", sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "12g"))
      }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/parquet-footer + (cluster) executor launch.
    // Generated corpora (GenCorpus output) carry only the doc tables, so
    // warm whichever of the two families is present.
    Seq("lineitem", "documents").foreach { t =>
      if (new java.io.File(s"$dir/$t.parquet").exists())
        spark.read.parquet(s"$dir/$t.parquet").count(): Unit
    }

    // only= may name ANY catalog query (the ScaleBench convention), so
    // new operators get multi-process datapoints without a subjects edit
    val run = only.fold(subjects)(o =>
        (subjects ++ o.toSeq.sorted).distinct.filter(o.contains))
      .filter(graft.SparkEntry.queries.contains)
    val samples = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Double]]
    for (_ <- 1 to reps; name <- run) {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[clusterbench] $name: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      samples.getOrElseUpdate(name, mutable.ArrayBuffer.empty) += dt
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val execs = spark.sparkContext.statusTracker.getExecutorInfos.length - 1
    val qs = samples.map { case (k, v) => "\"" + k + "\":" + fm(median(v.toSeq)) }
      .mkString("{", ",", "}")
    val raw = samples.map { case (k, v) => "\"" + k + "\":" + v.map(fm).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = samples.values.map(v => median(v.toSeq)).sum
    println(s"""{"master":"$master","executors":$execs,"total":${fm(total)},"queries":$qs,"samples":$raw,"dir":"$dir"}""")
    spark.stop()
  }
}
