package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary measurement probe — not committed.
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count()

    def time(label: String)(f: => Unit): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    time("A in-row nested filter (current)") {
      docs.withColumn("tk", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          "transform(array_distinct(tk), x -> struct(x AS tk, size(filter(tk, y -> y = x)) AS tf))")).as("p"))
        .agg(count(lit(1))).collect()
    }
    time("B explode + groupBy") {
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
        .groupBy("doc_id", "tk").agg(count(lit(1)).as("tf"))
        .agg(count(lit(1))).collect()
    }
    time("C in-row sorted run-length") {
      docs.withColumn("st", array_sort(split(col("text"), " ")))
        .select(col("doc_id"), explode(expr(
          """filter(transform(st, (x, i) -> IF(i = 0 OR st[i-1] != x,
             struct(x AS tk, size(filter(st, y -> y = x)) AS tf), null)), p -> p IS NOT NULL)""")).as("p"))
        .agg(count(lit(1))).collect()
    }
  }
}
