package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables.dotSql

/** Micro-benchmark: the K-regime boundary between the two IVF
  * assignment plans — the in-row LITERAL fold (`ann_ivf_kmeans`, model
  * rendered as code) and the broadcast MODEL-ROW fold
  * (`ann_ivf_broadcast_assign`, model as data). Both are one map-side
  * corpus pass with zero assignment shuffles; the difference is where
  * the model lives, and that decides how large K can grow:
  *
  *  - literal fold: K×64 doubles rendered into the expression tree —
  *    SQL text grows ~26 bytes/literal and EVERY phase that walks the
  *    tree (parse, analyze, optimize, render) pays it. Codegen itself
  *    survives surprisingly far (the array literal lands in the
  *    generated class's references table, not bytecode — the strict
  *    CODEGEN_ONLY probe stays green through K=4096), so the measured
  *    ceiling is PLANNING: at K=16384 (27 MB of SQL) the literal plan
  *    costs ~57 s of pure overhead before the first row, 30× the
  *    broadcast regime's ~1.9 s, linear in K (measured: 3.1 s / 13.2 s
  *    / 57.0 s at K=1k/4k/16k vs 0.3 s / 0.6 s / 1.9 s);
  *  - broadcast model row: K×64 doubles in ONE broadcast row — plan
  *    size is O(1) in K; only the row's bytes grow (64 KB per 128
  *    centroids). Execution flops are identical (both fold O(N·K·dim)
  *    map-side), so past K≈256 the regimes run neck and neck and the
  *    planning gap is the whole story.
  *
  * Run: `sbt "runMain graft.tools.AssignRegimeBench"` (defaults
  * N=200k, Ks=8,64,256,1024,4096; planning ladder 1k/4k/16k).
  * Results recorded in SCALING.md. */
object AssignRegimeBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("ASSIGN_BENCH_N", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic corpus: 64-dim vectors from a hash grid
    def vecExpr(id: String) =
      s"transform(sequence(0, 63), i -> CAST(pmod($id * 31 + i * 17, 97) AS DOUBLE) / 97.0D)"
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      expr(vecExpr("id")).as("v")).localCheckpoint()

    def centroids(k: Int): Seq[(Long, Seq[Double])] =
      spark.range(k).select(col("id"), expr(vecExpr("(id * 7919)")).as("c"))
        .collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }

    def literalAssign(cents: Seq[(Long, Seq[Double])], df: DataFrame): Long = {
      val e = graft.ops.SimilarityOps.kmeansAssignExpr(spark, cents)
      df.withColumn("cluster", expr(e + ".k"))
        .agg(sum("cluster")).head().getLong(0)
    }

    def broadcastAssign(cents: Seq[(Long, Seq[Double])], df: DataFrame): Long = {
      import spark.implicits._
      val centDf = cents.map { case (k, c) =>
        (k, c, c.foldLeft(0.0)((acc, x) => acc + x * x))
      }.toDF("k", "c", "n2")
      val model = centDf.agg(sort_array(
        collect_list(struct(col("k"), col("c"), col("n2")))).as("model"))
      val best =
        s"""aggregate(
              transform(model,
                ct -> struct(ct.k AS k, round(ct.n2 - 2.0D * ${dotSql(spark, "v", "ct.c")}, 6) AS d)),
              struct(CAST(-1 AS BIGINT) AS k, CAST('Infinity' AS DOUBLE) AS d),
              (acc, x) -> CASE WHEN x.d < acc.d THEN x ELSE acc END).k"""
      df.crossJoin(broadcast(model)).withColumn("cluster", expr(best))
        .agg(sum("cluster")).head().getLong(0)
    }

    // strict session: codegen fallback OFF — a regime that can't
    // compile is a loud failure here instead of a silent 10× slowdown.
    // The strict corpus is tiny (the probe measures COMPILABILITY, not
    // throughput) but non-empty, so the summing head() has a row.
    val strict = spark.newSession()
    strict.conf.set("spark.sql.codegen.fallback", "false")
    strict.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    def strictCorpus = strict.range(64).select(col("id").as("vec_id"),
      expr(vecExpr("id")).as("v"))

    val ks = sys.env.getOrElse("ASSIGN_BENCH_KS", "8,64,256,1024,4096")
      .split(",").map(_.trim.toInt).toSeq
    println(s"n=$n  dim=64  (times: corpus assignment + sum, seconds)")
    for (k <- ks) {
      val cents = centroids(k)
      val resB = time(broadcastAssign(cents, corpus))
      val strictB =
        try { broadcastAssign(cents, strictCorpus); "codegen-ok" }
        catch { case e: Throwable => s"CODEGEN-FAIL(${e.getClass.getSimpleName})" }
      val (resL, strictL) =
        try {
          val r = time(literalAssign(cents, corpus))
          val sl = try {
            literalAssign(cents, strictCorpus)
            "codegen-ok"
          } catch { case e: Throwable => s"CODEGEN-FAIL(${e.getClass.getSimpleName})" }
          (f"${r._1}%8.2f s (sum ${r._2})", sl)
        } catch { case e: Throwable =>
          (s"FAILED(${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(60)})", "n/a") }
      println(f"K=$k%5d  literal: $resL%-40s [$strictL]")
      println(f"         broadcast: ${resB._1}%8.2f s (sum ${resB._2}) [$strictB]")
    }

    // Part 2 — PLANNING cost isolated (tiny corpus, so wall time is
    // render+parse+analyze+codegen, not flops): the literal regime's
    // true ceiling. The rendered SQL grows ~26 bytes per literal double
    // (K=16384 × 64 dims ≈ 27 MB of expression text) and every phase
    // that walks the tree pays it; the model row is O(1) in plan size.
    val tiny = spark.range(1000).select(col("id").as("vec_id"),
      expr(vecExpr("id")).as("v")).localCheckpoint()
    val ks2 = sys.env.getOrElse("ASSIGN_BENCH_PLAN_KS", "1024,4096,16384")
      .split(",").map(_.trim.toInt).toSeq
    println("planning ladder (n=1000 — wall is plan cost):")
    for (k <- ks2) {
      val cents = centroids(k)
      val b = time(broadcastAssign(cents, tiny))
      val l = try f"${time(literalAssign(cents, tiny))._1}%8.2f s"
        catch { case e: Throwable => s"FAILED(${e.getClass.getSimpleName})" }
      val sqlMb = k * 64 * 26 / 1e6
      println(f"K=$k%6d  literal: $l%-28s (sql ~$sqlMb%.0f MB)   broadcast: ${b._1}%8.2f s")
    }
    spark.stop()
  }
}
