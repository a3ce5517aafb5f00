package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** Shortlist-width frontier for the two-stage PQ probe (SCALING.md's
  * round-8 companion study): for each width w, run the ADC-shortlist +
  * exact-rerank plan (`pqRerankWidth`) and score its recall@3 against
  * the brute-force dot-product top-3, alongside the probe's wall time.
  *
  * The width knob buys recall with RAW-VECTOR POINT LOOKUPS (w per
  * query) while the corpus-wide scan cost — the part that grows with N
  * — is width-independent (codes only). The frontier therefore shows
  * where recall saturates: past the saturation width, extra lookups buy
  * nothing, and below it each step down sheds recall fast. That
  * saturation point, not a folklore default, is what a 100 TB serving
  * deployment should pin.
  *
  * Usage: PqWidthStudy <sfDir> [widths=5,10,20,50,100]
  */
object PqWidthStudy {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PqWidthStudy <sfDir> [widths=a,b,c]")
    val dir = args(0)
    val widths = args.find(_.startsWith("widths="))
      .map(_.stripPrefix("widths=").split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(5, 10, 20, 50, 100))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val n = e.count()
    val q = e.filter(col("vec_id") < SimilarityOps.PqQueryCount)
    val scored = q.as("q").join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"),
        expr("aggregate(zip_with(q.v, c.v, (x, y) -> x*y), 0D, (acc, x) -> acc + x)").as("dp"))
    val w = Window.partitionBy("qid").orderBy(col("dp").desc, col("nid"))
    val exact = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SimilarityOps.PqTopK)
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }

    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val rows = widths.map { width =>
      val t0 = System.nanoTime()
      val got = SimilarityOps.pqRerankWidth(spark, dir, width).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val byQ = got.groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
      val recalls = exact.map { case (k, t) => (t & byQ.getOrElse(k, Set.empty)).size.toDouble / t.size }
      val recall = recalls.sum / recalls.size
      s"""{"width":$width,"recall_at_3":${fm(recall)},"sec":${fm(dt)}}"""
    }
    println(s"""{"dir":"$dir","n_vecs":$n,"queries":${SimilarityOps.PqQueryCount},"sweep":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
