package graft.tools

import org.apache.spark.sql.SparkSession

/** Materialize a `graft-docs` generated corpus as a testdata-shaped
  * directory (documents.parquet + the sf0.1 embeddings copied in), so
  * ScaleBench can run the doc-family operators at corpus sizes the
  * disk-replica study cannot reach (the generator is O(0) disk until
  * this write; the write itself is the only cost).
  * Usage: GenCorpus <outDir> <nDocs> [seed]
  */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenCorpus <outDir> <nDocs> [seed]")
    val (out, n) = (args(0), args(1).toLong)
    val seed = if (args.length > 2) args(2).toLong else 42L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.format("graft-docs")
      .option("n", n).option("seed", seed).option("partitions", 32)
      .load()
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"GENCORPUS: $out n=$n seed=$seed")
    spark.stop()
  }
}
