package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE stress probe — answers the round-9 open question: does the
  * rendered-expression path (one literal `replace` per learned merge,
  * appearing TWICE inside the token-count lambda) hold at
  * tokenizer-real round counts, and how does training cost move with
  * rounds at a large vocabulary? Trains `rounds` merges on `dir`, then
  * times one full-corpus tokenize pass under
  * `spark.sql.codegen.fallback=false` + `factoryMode=CODEGEN_ONLY` so
  * a Janino failure of the deep replace chain is LOUD, not a silent
  * interpreted fallback.
  *
  * Usage: BpeProbe <sfDir> [rounds] [reps]   (defaults 16, 1)
  *
  * `reps` > 1 times the tokenize pass repeatedly after the single
  * training run (training is the factored-OUT term in the ladder
  * studies) and reports every sample plus the median — the honest
  * protocol of the SCALING.md growth studies, where pass-1 JIT must
  * be visible in the artifact rather than silently averaged in.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BpeProbe <sfDir> [rounds] [reps]")
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(16)
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      // r19: load the extension so the probe certifies the PRODUCTION
      // tokenize path (native bpe_atomize) under strict codegen; unset
      // SPARK_GRAFT_BPE_NOEXT=1 to probe the regex fallback instead
      .config("spark.sql.extensions",
        if (sys.env.contains("SPARK_GRAFT_BPE_NOEXT")) ""
        else "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val (merges, words) = graft.ops.TextOps.bpeTrain(spark, dir, rounds)
    val trainSec = (System.nanoTime() - t0) / 1e9
    val vocab = words.count()

    // the applied tokenizer over the corpus, strict-codegen — built by
    // THE production chain builder so the probe certifies exactly what
    // bpe_token_count runs
    val atomized = spark.catalog.functionExists("bpe_atomize")
    val chain = graft.ops.TextOps.bpeChainExpr(merges, preAtomized = atomized)
    var agg: org.apache.spark.sql.Row = null
    val samples = (1 to reps).map { _ =>
      val t1 = System.nanoTime()
      agg = graft.streaming.DocStreams
        .bpeTokenizeScreen(spark.read.parquet(s"$dir/documents.parquet"),
          chain, atomized)
        .agg(sum("n_ws_tokens").as("ws"), sum("n_bpe_tokens").as("bpe")).head()
      (System.nanoTime() - t1) / 1e9
    }
    val sorted = samples.sorted
    val tokSec =
      if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2
    val (ws, bpe) = (agg.getLong(0), agg.getLong(1))
    def fm(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"probe":"bpe","rounds":$rounds,"vocab":$vocab,"train_sec":${fm(trainSec)},""" +
      s""""tokenize_sec":${fm(tokSec)},"tokenize_samples":[${samples.map(fm).mkString(",")}],""" +
      s""""ws_tokens":$ws,"bpe_tokens":$bpe,""" +
      // fertility = BPE tokens per whitespace word — the standard
      // tokenizer quality metric, decreasing as rounds merge more
      s""""fertility":${fm(bpe.toDouble / ws)},"merges":"${merges.map(m => m._1 + "+" + m._2).mkString(",")}"}""")
    spark.stop()
  }
}
