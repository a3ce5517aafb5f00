package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.CorpusSink

/** The curated-corpus sink: partitioned layout, partition pruning on
  * read, and agreement with the batch capstone's keep verdict. */
class CorpusSinkSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("curated write is lang-partitioned, pruned on read, and matches the capstone") {
    val path = Files.createTempDirectory("graft_curated_").toString
    val total = CorpusSink.writeCurated(spark, dir, path)

    val expected = SparkEntry.queries("corpus_curation")(spark, dir)
      .filter(col("keep") === 1).count()
    assert(total == expected, s"wrote $total, capstone keeps $expected")

    // physical layout: one directory per written language
    val langDirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.nonEmpty, s"no partition dirs under $path")

    // a lang filter must reach the scan as a PartitionFilter, not a
    // post-scan Filter over all partitions
    val df = CorpusSink.readCurated(spark, path).filter(col("lang") === "en")
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"), plan)

    // and the pruned read returns exactly the en subset
    val enKept = CorpusSink.readCurated(spark, path)
      .filter(col("lang") === "en").count()
    assert(df.count() == enKept && enKept > 0 && enKept < total)
  }
}
