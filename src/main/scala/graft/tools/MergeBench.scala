package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Growth study for the CDC MERGE kernel — the one round-8 plan class
  * (a fact-sized FULL-OUTER join, both sides shuffled by construction)
  * without a measured exponent in SCALING.md's replica studies.
  *
  * Snapshot = `graft-docs` generated keys (so any N is reachable with
  * no disk behind it); change batch = a hash-derived 10%-of-keyspace
  * mix of deletes/updates/inserts (the cdc_merge_upsert recipe,
  * corpus-size-proportional). Each sample times ONE
  * `MigrationOps.mergeBatch` materialized through the noop sink, the
  * graft.Bench discipline (pass-interleaved median of reps).
  *
  * Usage: MergeBench [n1,n2,...] [reps]   (defaults 100000,500000,1000000 / 3)
  */
object MergeBench {

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(100000L, 500000L, 1000000L))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def snapshot(n: Long) = spark.read.format("graft-docs")
      .option("n", n.toString).load()
      .select(col("doc_id").as("key"),
        col("n_chars").cast("long").as("s_len"),
        col("lang").as("s_lang"))
    def changes(n: Long) = spark.read.format("graft-docs")
      .option("n", n.toString).load()
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .withColumn("m", pmod(xxhash64(col("doc_id")), lit(10L)))
      .filter(col("m") <= 0) // ~10% of the keyspace carries an op
      .select(
        when(pmod(xxhash64(col("doc_id"), lit(1)), lit(3L)) === 2,
          col("doc_id") + lit(10000000000L)).otherwise(col("doc_id")).as("key"),
        when(pmod(xxhash64(col("doc_id"), lit(1)), lit(3L)) === 0, lit("delete"))
          .when(pmod(xxhash64(col("doc_id"), lit(1)), lit(3L)) === 1, lit("update"))
          .otherwise(lit("insert")).as("op"),
        (col("n_chars") + 1L).cast("long").as("c_len"),
        lit(null).cast("string").as("c_lang"))

    // warmup (executor/codegen) on the smallest size
    snapshot(sizes.min).count(): Unit

    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val samples = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[Double]]
    for (_ <- 1 to reps; n <- sizes) {
      val t0 = System.nanoTime()
      graft.ops.MigrationOps.mergeBatch(snapshot(n), changes(n), Seq("len", "lang"))
        .write.mode("overwrite").format("noop").save()
      samples.getOrElseUpdate(n, mutable.ArrayBuffer.empty) +=
        (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val qs = samples.map { case (n, v) => s""""$n":${fm(median(v.toSeq))}""" }
      .mkString("{", ",", "}")
    val raw = samples.map { case (n, v) =>
      s""""$n":${v.map(fm).mkString("[", ",", "]")}""" }.mkString("{", ",", "}")
    println(s"""{"study":"merge_growth","sizes":$qs,"samples":$raw,"reps":$reps}""")
    spark.stop()
  }
}
