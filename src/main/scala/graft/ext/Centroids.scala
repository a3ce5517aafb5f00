package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed custom aggregate: per-bucket embedding centroids via
  * Aggregator[IN, BUF, OUT] — the typed-aggregation extension path
  * (SURVEY §2.12: built-in functions first, Aggregator for custom
  * aggregates, TypedImperativeAggregate only if codegen-level
  * performance demanded).
  *
  * Element-wise sums merge associatively across partitions (classic
  * map-side partial aggregation), so the shuffle carries one
  * 64-double buffer per (label, partition), not the vectors.
  */
object Centroids {

  /** Sums fixed-width vectors element-wise; finish divides by count. */
  class CentroidAggregator(dim: Int)
      extends Aggregator[(Int, Seq[Double]), (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    override def reduce(b: (Array[Double], Long), row: (Int, Seq[Double])): (Array[Double], Long) = {
      val v = row._2
      var i = 0
      while (i < dim && i < v.length) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    override def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Per-label centroid of the embedding column, exploded to
    * (label, dim, centroid) rows rounded to 6 decimals for cross-engine
    * comparison. */
  def centroidsByLabel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = new CentroidAggregator(64).toColumn.name("centroid")
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("label"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .as[(Int, Seq[Double])]
      .groupByKey(_._1)
      .agg(agg)
      .toDF("label", "centroid")
      .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "c")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("c"), 6).as("centroid6"))
  }
}
