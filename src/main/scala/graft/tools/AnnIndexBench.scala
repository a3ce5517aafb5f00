package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Growth study for the persisted ANN index (`writeAnnIndex` /
  * `annAgainstIndex`) on GENERATED vectors — the honest protocol
  * (every sample in the artifact, pass-interleaved reps, medians)
  * applied to the three costs the serving split separates:
  *
  *  - BUILD: one batch job (mean + PQ codebooks + coarse centroids +
  *    the bucketed codes/vectors tables) — paid once per corpus;
  *  - PROBE-50: the standard 50-query serve against the persisted
  *    index (ADC over the probed cells' codes + shortlist rerank);
  *  - PROBE-2: a 2-query serve — the bucket-pruning regime, where the
  *    `cell IN (...)` restriction lets the codes scan skip most of the
  *    8 buckets outright;
  *  - INLINE: the `ann_ivfpq_topk` shape, which re-trains everything
  *    inside the query — what every serve costs WITHOUT the index.
  *
  * Vectors are derived in-row from `spark.range` (deterministic
  * xxhash64 features in [-1, 1], any N reachable, no disk behind the
  * generator beyond the scratch parquet the dir-based API reads).
  *
  * Usage: AnnIndexBench [n1,n2,...] [reps] [workDir]
  *   (defaults 100000,1000000,10000000 / 3 / /tmp/graft_annbench)
  */
object AnnIndexBench {

  /** n deterministic 64-dim float vectors in the embeddings schema. */
  def genVectors(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63),
               i -> cast((pmod(xxhash64(id, i), 2001) - 1000) / 1000.0 AS float))""")
        .as("embedding"),
      pmod(col("id"), lit(8L)).as("label"))

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(100000L, 1000000L, 10000000L))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val work = args.lift(2).getOrElse("/tmp/graft_annbench")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE DATABASE IF NOT EXISTS annbench")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    for (n <- sizes) {
      val dir = s"$work/n$n"
      genVectors(spark, n).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      val prefix = s"annbench.idx_$n"
      val build = time(graft.ops.SimilarityOps.writeAnnIndex(spark, dir, prefix))
      def queries(k: Long) = spark.table(s"${prefix}_vectors")
        .filter(col("vec_id") < k).select("vec_id", "v")
      // the offline regime: a 1k-query batch (new arrivals under
      // shifted ids) probed in BOTH serving shapes — broadcast (the
      // interactive default, ships every LUT to every codes task) vs
      // shuffle (only the query side exchanges; the bucketed index
      // reads in place) — the measured A/B behind the
      // broadcastQueries knob. Skipped above 1M corpus rows: with
      // this fixture's K=8 cells the ADC term is
      // |corpus|·|batch|/K pairs (~1.25B at 10M×1k), a cost a
      // production cell count (thousands) keeps bounded — the
      // fixture would measure K-starvation, not the join shape.
      val bigQOk = n <= 1000000L
      val bigQ = spark.table(s"${prefix}_vectors")
        .filter(col("vec_id") < 1000L)
        .select((col("vec_id") + 1000000000L).as("vec_id"), col("v"))
      val samples = mutable.Map[String, mutable.ArrayBuffer[Double]]()
      for (_ <- 1 to reps) { // pass-interleaved: one contention window
        // costs at most one sample per flavor
        samples.getOrElseUpdate("probe50", mutable.ArrayBuffer.empty) +=
          time(noop(graft.ops.SimilarityOps.annAgainstIndex(spark, queries(50L), prefix)))
        samples.getOrElseUpdate("probe2", mutable.ArrayBuffer.empty) +=
          time(noop(graft.ops.SimilarityOps.annAgainstIndex(spark, queries(2L), prefix)))
        if (bigQOk) {
          samples.getOrElseUpdate("probe1k_bc", mutable.ArrayBuffer.empty) +=
            time(noop(graft.ops.SimilarityOps.annAgainstIndex(spark, bigQ, prefix)))
          samples.getOrElseUpdate("probe1k_sh", mutable.ArrayBuffer.empty) +=
            time(noop(graft.ops.SimilarityOps.annAgainstIndex(spark, bigQ, prefix,
              broadcastQueries = false)))
        }
        samples.getOrElseUpdate("inline", mutable.ArrayBuffer.empty) +=
          time(noop(graft.ops.SimilarityOps.annIvfPqTopk(spark, dir)))
        spark.catalog.clearCache()
      }
      def med(k: String): Double = {
        val s = samples(k).sorted
        if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
      }
      def all(k: String): String = samples(k).map(fm).mkString("[", ",", "]")
      val big = if (bigQOk)
        s"probe1k_bc=${fm(med("probe1k_bc"))} probe1k_sh=${fm(med("probe1k_sh"))} "
      else ""
      val bigS = if (bigQOk)
        s"probe1k_bc=${all("probe1k_bc")} probe1k_sh=${all("probe1k_sh")} "
      else ""
      println(s"ANNIDX: n=$n build=${fm(build)} " +
        s"probe50=${fm(med("probe50"))} probe2=${fm(med("probe2"))} " +
        big +
        s"inline=${fm(med("inline"))} " +
        s"samples probe50=${all("probe50")} probe2=${all("probe2")} " +
        bigS +
        s"inline=${all("inline")}")
    }
    spark.stop()
  }
}
