package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Tables, TextOps}

/** The output side of the curation pipeline: persist the kept documents
  * as a parquet layout downstream training jobs can prune.
  *
  * Partitioned by `lang` — the column every downstream consumer filters
  * on (per-language tokenizer runs, language-mix scheduling), so a
  * `lang = 'en'` read touches only that directory tree
  * (PartitionFilters, verified by CorpusSinkSpec). Within a partition
  * the writer splits files by `maxRecordsPerFile` so a skewed language
  * (English is most of a web corpus) still yields parallel read splits
  * rather than one giant file. At 100 TB you would additionally bucket
  * by the content hash to make the exact-dedup join against tomorrow's
  * crawl co-located — the same move as
  * [[graft.ops.DedupOps.writeBandIndex]].
  */
object CorpusSink {

  /** Run the batch curation capstone over `dir` and write the kept
    * documents (with their text and provenance) to `path/lang=…/`.
    * Returns the kept count. */
  def writeCurated(s: SparkSession, dir: String, path: String,
      maxRecordsPerFile: Long = 1000000L): Long = {
    val kept = TextOps.corpusCuration(s, dir)
      .filter(col("keep") === 1)
      .select("doc_id", "pred_lang", "n_tokens")
    val docs = Tables.t(s, dir, "documents")
      .select("doc_id", "text", "lang", "source")
    val out = docs.join(kept, "doc_id")
    out.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("lang")
      .parquet(path)
    s.read.parquet(path).count()
  }

  /** Read a curated corpus back; filters on `lang` prune partitions. */
  def readCurated(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
}
