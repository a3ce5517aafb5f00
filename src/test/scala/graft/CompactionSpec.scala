package graft

import org.apache.spark.sql.functions._

import ops.LayoutOps
import sources.Compaction

/** Contracts of parquet compaction ([[graft.sources.Compaction]]):
  * lossless content, right-sized file arithmetic, the per-file row
  * cap, and — the part naive rewrites lose — clustering repair: a
  * fragmented z-ordered table compacted WITH `clusterBy` comes out
  * with non-overlapping per-file key ranges (pruning survives), while
  * the same compaction without it interleaves the key (pruning dies).
  */
class CompactionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  // order-free content checksum over every column of every row
  // (decimal sum — a long sum of 60k hashes overflows under ANSI)
  private def checksum(path: String): java.math.BigDecimal =
    spark.read.parquet(path)
      .select(xxhash64(to_json(struct(col("*")))).cast("decimal(38,0)").as("h"))
      .agg(sum("h")).head().getDecimal(0)

  test("compaction is lossless and lands the file arithmetic") {
    val frag = s"$scratch/compact_frag"
    val out = s"$scratch/compact_out"
    val keyed = LayoutOps.layoutZorderKey(spark, sfDir) // 60k rows, 5 cols
    keyed.repartition(64).write.mode("overwrite").parquet(frag)
    assert(spark.read.parquet(frag).inputFiles.length == 64)

    val st = Compaction.compactParquet(spark, frag, out, targetRecordsPerFile = 10000)
    assert(st.filesBefore == 64)
    assert(st.rows == 60000)
    assert(st.filesAfter == 6, s"expected ceil(60000/10000)=6 files, got ${st.filesAfter}")
    assert(checksum(out) == checksum(frag))
    // the cap holds per actual emitted file
    // cap: no file exceeds target + 10% headroom (the jitter allowance)
    val overCap = spark.read.parquet(out)
      .groupBy(input_file_name()).count().filter(col("count") > 11000)
    assert(overCap.count() == 0)
  }

  test("clusterBy repairs layout: per-file key ranges are disjoint after compaction") {
    val frag = s"$scratch/compact_zfrag"
    val plain = s"$scratch/compact_zplain"
    val clustered = s"$scratch/compact_zclustered"
    // fragment WITHOUT layout: 64 files, z interleaved everywhere
    LayoutOps.layoutZorderKey(spark, sfDir)
      .repartition(64).write.mode("overwrite").parquet(frag)

    def zRanges(path: String): Array[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("z").as("z0"), max("z").as("z1"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1)

    Compaction.compactParquet(spark, frag, plain, 4000)
    Compaction.compactParquet(spark, frag, clustered, 4000, clusterBy = Seq("z"))

    val plainRanges = zRanges(plain)
    val clusteredRanges = zRanges(clustered)
    // naive compaction: every file spans (nearly) the whole z domain —
    // overlap everywhere
    val plainOverlaps = plainRanges.sliding(2).count {
      case Array((_, hi1), (lo2, _)) => hi1 > lo2
      case _ => false
    }
    assert(plainOverlaps > 0, "naive compaction unexpectedly produced clustered files")
    // clustered compaction: consecutive files' ranges are disjoint —
    // min/max pruning works again
    clusteredRanges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping clustered files: hi=$hi1 lo=$lo2")
      case _ =>
    }
    assert(checksum(clustered) == checksum(frag))
  }
}
