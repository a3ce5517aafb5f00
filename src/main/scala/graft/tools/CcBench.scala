package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Micro-benchmark: min-label propagation vs large-star/small-star
  * contraction on the REAL verified near-dup pair graph (the input of
  * `dedup_cluster_reps`), at the bench scale factor. Decides which
  * algorithm the catalog entry ships as default (the output contract —
  * label = component min — is identical, so the DuckDB oracle and
  * DedupClusterSpec hold for either). Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.CcBench"`.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val verified = DedupOps.dedupMinhashLsh(spark, sfDir)
      .filter(col("n_match") >= 12).select(col("a"), col("b"))
      .localCheckpoint() // materialize: time ONLY the CC part below
    println(s"edges: ${verified.count()}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s  (rows $n)")
    }

    for (pass <- 1 to 3) {
      time(s"pass$pass propagation") {
        DedupOps.connectedComponents(verified).count()
      }
      time(s"pass$pass star") {
        val (labels, alts) = DedupOps.connectedComponentsStar(verified)
        val n = labels.count(); println(s"  alternations: $alts"); n
      }
      time(s"pass$pass full-entry (LSH+propagation)") {
        DedupOps.dedupClusterReps(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
